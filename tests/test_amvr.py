"""AMVR / IMV (adaptive MV resolution): integer- and 4-pel-precision
AMVP with imv-rounded MVP candidates (PU::fillMvpCand with cu.imv),
imv_mode syntax (CABACWriter.cpp:1940) — oracle bit-exact."""

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


def test_amvr_rounding():
    # roundTransPrecInternal2Amvr grids
    assert inter.mv_round_to_amvr(23, 1) == 16     # -> nearest int pel
    assert inter.mv_round_to_amvr(-23, 1) == -16
    assert inter.mv_round_to_amvr(100, 2) == 128   # -> nearest 4-pel
    assert inter.mv_internal_to_amvr(32, 1) == 2   # int-pel units
    assert inter.mv_internal_to_amvr(128, 2) == 2  # 4-pel units


def test_amvr_ippp_bitexact():
    """Clean integer-pel pan: full-pel MVD costs fewer bits, so some
    CUs must pick imv > 0 — and the stream must stay bit-exact."""
    w = h = 128
    qp = 30
    rng = np.random.RandomState(9)
    base = np.clip(512 + 300 * np.sin(np.arange(w + 64) / 3.0)[None, :]
                   * np.cos(np.arange(h + 64) / 5.0)[:, None]
                   + rng.randint(-4, 4, (h + 64, w + 64)),
                   0, 1023).astype(np.int32)
    flat_u = np.full((h // 2, w // 2), 512, np.int32)
    flat_v = np.full((h // 2, w // 2), 420, np.int32)
    frames = []
    for t in range(4):
        sh = 7 * t                      # 7-pel/frame integer pan
        frames.append((base[sh:sh + h, sh:sh + w].copy(),
                       flat_u, flat_v))
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, amvr=True)
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = gop.SequenceEncoder(cfg, me_range=12).encode(frames,
                                                               qp=qp)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    dec = decode_y(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    assert any("imv" in e for e in evs), "no CU chose imv > 0"


def test_amvr_b_with_tools_bitexact():
    """AMVR together with SMVD/MMVD/BCW on a B pyramid."""
    w = h = 128
    qp = 33
    rng = np.random.RandomState(17)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(5):
        y = np.clip(512 + 280 * np.sin((xx - 2.4 * t) / 10.0)
                    * np.cos((yy - 1.1 * t) / 12.0)
                    + rng.randint(-5, 5, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy + t) / 6.0), 0,
                    1023).astype(np.int32)
        frames.append((y, u, v))
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, amvr=True, smvd=True,
                        mmvd=True, bcw=True, temporal_mvp=True,
                        num_reorder_pics=2, max_dec_pic_buffering=5)
    res = gop.RandomAccessEncoder(cfg, gop_size=4,
                                  me_range=8).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
