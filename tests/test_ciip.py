"""CIIP (combined inter/intra prediction): planar+merge blending with
neighbor-intra weights (IntraPrediction::geneWeightedPred,
IntraPrediction.cpp:683), regular_merge_flag syntax
(CABACWriter.cpp:1891), CIIP deblocking BS rule (LoopFilter.cpp:755) —
oracle bit-exact."""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.utils import trace

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def mk(w, h, n, seed=23):
    """Motion + a slowly drifting gradient: the inter part tracks the
    texture, the intra (planar) part models the gradient drift —
    exactly the blend CIIP wins on."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        grad = (xx + yy) * (0.8 + 0.1 * t)
        y = np.clip(300 + grad + 120 * np.sin((xx - 2 * t) / 11.0)
                    + rng.randint(-4, 4, (h, w)), 0, 1023).astype(np.int32)
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


def run(cfg, frames, qp, ra=False):
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            if ra:
                res = gop.RandomAccessEncoder(cfg, gop_size=4,
                                              me_range=8).encode(
                    frames, qp=qp)
            else:
                res = gop.SequenceEncoder(cfg, me_range=8).encode(
                    frames, qp=qp)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    return res, evs


def test_ciip_ippp_bitexact():
    w = h = 128
    qp = 34
    frames = mk(w, h, 4)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, ciip=True, deblocking=True)
    res, evs = run(cfg, frames, qp)
    dec = decode_y(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    assert any(e.get("ciip") for e in evs), "no CU chose CIIP"


def test_ciip_b_with_tools_bitexact():
    w = h = 128
    qp = 34
    frames = mk(w, h, 5, seed=31)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, ciip=True, mmvd=True,
                        bcw=True, temporal_mvp=True,
                        num_reorder_pics=2, max_dec_pic_buffering=5)
    res, evs = run(cfg, frames, qp, ra=True)
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
