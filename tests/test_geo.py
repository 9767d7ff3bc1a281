"""GEO / GPM (geometric partitioning merge): analytic mode table +
weight masks (initGeoTemplate, Rom.cpp:716), uni candidate derivation
(UnitTools.cpp:3285), blending (InterpolationFilter.cpp:890), motion
span (UnitTools.cpp:3343), geo merge syntax — oracle bit-exact."""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.ops import geo, inter
from fastintercu_vvc_tpu.utils import trace

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def test_geo_mode_table():
    params = geo.geo_params()
    assert len(params) == 64
    # first modes: angle 0 dist 1 and 3 only (dist 0/2 excluded for
    # mask 0); angle 2 gets dist 0..3
    assert params[0] == (0, 1) and params[1] == (0, 3)
    assert params[2] == (2, 0)
    # no angle with mask -1 appears
    for a, d in params:
        assert geo.ANGLE2MASK[a] != -1


def test_geo_weight_mask_properties():
    for d in (0, 10, 30, 63):
        wm = geo.weight_mask(d, 32, 16)
        assert wm.shape == (16, 32)
        assert wm.min() >= 0 and wm.max() <= 8
        assert 0 in wm and 8 in wm        # both partitions present
        # chroma mask = luma mask subsampled 2x starting at (0, 0)
        cm = geo.weight_mask(d, 16, 8, scale=1)
        lm = geo.weight_mask(d, 32, 16)
        np.testing.assert_array_equal(cm, lm[0::2, 0::2])


def test_geo_uni_candidates_parity_rule():
    cands = [
        inter.MotionInfo(3, (16, 0), (-16, 0), 0, 0),   # i=0 -> L0
        inter.MotionInfo(3, (32, 0), (-32, 0), 1, 0),   # i=1 -> L1
        inter.MotionInfo(1, (48, 0), (0, 0), 0, -1),    # i=2 -> L0
        inter.MotionInfo(2, (0, 0), (-48, 0), -1, 1),   # i=3 -> L1
    ]
    uni = geo.geo_merge_candidates(cands, 5)
    assert [u.inter_dir for u in uni] == [1, 2, 1, 2]
    assert uni[0].mv0 == (16, 0)
    assert uni[1].mv1 == (-32, 0)
    assert uni[3].mv1 == (-48, 0)


def test_geo_span_partitions():
    mi0 = inter.MotionInfo(1, (64, 0), (0, 0), 0, -1)
    mi1 = inter.MotionInfo(2, (0, 0), (-64, 0), -1, 0)
    span = geo.span_motion(0, 32, 32, mi0, mi1)
    dirs = {span[by, bx].inter_dir for by in range(8) for bx in range(8)}
    assert 1 in dirs and 2 in dirs       # both sides stored
    assert 3 in dirs                     # blend band stores bi


def test_geo_hierarchical_b_bitexact():
    """Two objects moving in opposite directions with a diagonal
    boundary: GPM's home turf."""
    w = h = 128
    qp = 34
    rng = np.random.RandomState(41)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(5):
        a = 450 + 250 * np.sin((xx - 4 * t) / 7.0)       # moves right
        b = 550 + 250 * np.cos((xx + 4 * t) / 9.0)       # moves left
        m = (xx + 2 * yy < w + 16)                        # diagonal edge
        y = np.clip(np.where(m, a, b)
                    + rng.randint(-4, 4, (h, w)), 0, 1023).astype(
            np.int32)
        u = np.clip(512 + 100 * np.sin((cx - t) / 8.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 100 * np.cos((cy + t) / 9.0), 0,
                    1023).astype(np.int32)
        frames.append((y, u, v))
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, geo=True,
                        max_mtt_depth_inter=1, deblocking=True,
                        num_reorder_pics=2, max_dec_pic_buffering=5)
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = gop.RandomAccessEncoder(cfg, gop_size=4,
                                          me_range=8).encode(frames,
                                                             qp=qp)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(res.bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        for t in range(5):
            f = out[t * per:(t + 1) * per]
            np.testing.assert_array_equal(
                f[:w * h].reshape(h, w).astype(int),
                res.recons[t].recon, err_msg=f"f{t} luma")
            np.testing.assert_array_equal(
                f[w * h:w * h + per // 6].reshape(h // 2, w // 2)
                .astype(int), res.recons[t].recon_cb,
                err_msg=f"f{t} cb")
    assert any("geo" in e for e in evs), "no CU chose GEO"
