"""MMVD (merge with MVD): candidate derivation, mmvd_merge_flag /
mmvd_merge_idx syntax, bi-pred offset mirroring — oracle bit-exact.

Reference behavior: MergeCtx::setMmvdMergeCandiInfo
(ContextModelling.cpp:380), CABACWriter::merge_data (:1891) and
mmvd_merge_idx (:2095).
"""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.ops import inter
from fastintercu_vvc_tpu.utils import trace

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def mk(w, h, n, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        # diagonal pan with noise: merge MVs are close but rarely exact,
        # the regime where MMVD refinement wins
        y = np.clip(512 + 300 * np.sin((xx - 2.7 * t) / 9.0)
                    * np.cos((yy - 1.3 * t) / 11.0)
                    + rng.randint(-6, 6, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy + t) / 6.0), 0,
                    1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def decode_y(bs, w, h, n):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per, (out.size // per, n)
        return [out[t * per:t * per + w * h].reshape(h, w).astype(int)
                for t in range(n)]


def encode_with_cu_trace(encode_fn):
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = encode_fn()
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    return res, evs


def test_mmvd_motion_bi_mirror():
    """Symmetric B (equal |POC| distance, opposite sign): the signed
    deltas differ, so the L1 offset is POC-scaled by -1 — mirrored
    (setMmvdMergeCandiInfo scale path with scale == -4096)."""
    bases = [inter.MotionInfo(3, (64, -32), (-64, 32), 0, 0)]
    mi = inter.mmvd_motion(bases, 4, cur_poc=1, ref_pocs_l0=[0],
                           ref_pocs_l1=[2], w=16, h=16)
    # cand 4 -> step 1 (dist 2 qpel = 8 internal), pos 0 (+x)
    assert mi.mv0 == (64 + 8, -32)
    assert mi.mv1 == (-64 - 8, 32)


def test_mmvd_motion_scaled():
    """Unequal distances: the nearer list keeps the offset, the other is
    POC-distance scaled (here mirrored: -offset)."""
    bases = [inter.MotionInfo(3, (0, 0), (0, 0), 0, 0)]
    mi = inter.mmvd_motion(bases, 2, cur_poc=2, ref_pocs_l0=[0],
                           ref_pocs_l1=[3], w=16, h=16)
    # cand 2 -> step 0 (dist 1 qpel = 4 internal), pos 2 (+y);
    # |poc1-cur|=1 < |poc0-cur|=2 -> L1 scaled by (1/-2 mirrored)
    assert mi.mv0 == (0, 4)
    scale = inter.dist_scale_factor(2, 3, 2, 0)
    assert mi.mv1 == inter.scale_mv((0, 4), scale)


def test_mmvd_ippp_bitexact():
    w = h = 128
    qp = 32
    frames = mk(w, h, 5)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, mmvd=True)
    res, evs = encode_with_cu_trace(
        lambda: gop.SequenceEncoder(cfg, me_range=8).encode(frames, qp=qp))
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    assert any("mmvd" in e for e in evs), "no CU chose MMVD"


def test_mmvd_hierarchical_b_bitexact():
    w = h = 128
    qp = 34
    frames = mk(w, h, 5, seed=3)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, mmvd=True,
                        temporal_mvp=True, num_reorder_pics=2,
                        max_dec_pic_buffering=5)
    res, evs = encode_with_cu_trace(
        lambda: gop.RandomAccessEncoder(cfg, gop_size=4,
                                        me_range=8).encode(frames, qp=qp))
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    assert any("mmvd" in e for e in evs), "no CU chose MMVD"
