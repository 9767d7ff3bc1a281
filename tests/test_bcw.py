"""BCW (bi-prediction with CU-level weights): cu_bcw_flag syntax
(CABACWriter.cpp:877), addWeightedAvg math (Buffer.cpp:350), merge /
MMVD weight inheritance — oracle bit-exact."""

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


def mk(w, h, n, seed=13):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        # exponential fade + pan: the mid frame is NOT the average of
        # its references, so unequal weights win (a linear fade would
        # be perfectly predicted by the default 4/8 average)
        gain = 0.82 ** t
        y = np.clip(gain * (512 + 280 * np.sin((xx - 2 * t) / 10.0)
                            * np.cos((yy - t) / 12.0))
                    + rng.randint(-5, 5, (h, w)), 0, 1023).astype(np.int32)
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


def test_bcw_avg_math():
    a = np.full((4, 4), 1000, np.int32)   # intermediate domain
    b = np.full((4, 4), -2000, np.int32)
    for idx in range(5):
        w1 = inter.BCW_WEIGHTS[idx]
        w0 = 8 - w1
        shift = 4 + 3          # 10-bit
        off = (1 << (shift - 1)) + (8192 << 3)
        exp = np.clip((1000 * w0 + (-2000) * w1 + off) >> shift, 0, 1023)
        got = inter.bcw_avg(a, b, idx, 10)
        assert got[0, 0] == exp, idx
    # default weight must equal the plain average
    np.testing.assert_array_equal(inter.bcw_avg(a, b, 2, 10),
                                  inter.bi_avg(a, b, 10))


def test_bcw_hierarchical_b_bitexact():
    """B frame that is exactly a 5/8-3/8 mixture of its references:
    non-default BCW weights are the best model and must both be chosen
    and decode bit-exactly."""
    w = h = 128
    qp = 30
    rng = np.random.RandomState(2)
    yy, xx = np.mgrid[0:h, 0:w]
    a = np.clip(512 + 300 * np.sin(xx / 5.0) * np.cos(yy / 7.0),
                0, 1023).astype(np.int32)
    b = np.clip(512 + 300 * np.cos(xx / 6.0) * np.sin(yy / 4.0),
                0, 1023).astype(np.int32)
    mid = np.clip((5 * a + 3 * b + 4) >> 3, 0, 1023).astype(np.int32)
    flat_u = np.full((h // 2, w // 2), 512, np.int32)
    flat_v = np.full((h // 2, w // 2), 420, np.int32)
    frames = [(a, flat_u, flat_v), (mid, flat_u, flat_v),
              (b, flat_u, flat_v)]
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, bcw=True,
                        num_reorder_pics=1, max_dec_pic_buffering=4)
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = gop.RandomAccessEncoder(cfg, gop_size=2,
                                          me_range=8).encode(frames, qp=qp)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    dec = decode_y(res.bitstream, w, h, 3)
    for t in range(3):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    # w1 applies to L1 (= frame b): (5a+3b)/8 -> w1 = 3/8 -> bcw idx 1
    assert any(e.get("bcw") == 1 for e in evs), \
        "no CU chose the 3/8-L1 weight"


def test_bcw_smvd_mmvd_combo_bitexact():
    """BCW + SMVD + MMVD enabled together (merge inheritance paths)."""
    w = h = 128
    qp = 34
    frames = mk(w, h, 5, seed=21)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, bcw=True, smvd=True,
                        mmvd=True, temporal_mvp=True,
                        num_reorder_pics=2, max_dec_pic_buffering=5)
    res = gop.RandomAccessEncoder(cfg, gop_size=4,
                                  me_range=8).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
