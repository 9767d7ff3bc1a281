"""CCLM (cross-component linear model): 6-tap luma downsampling
(xGetLumaRecPixels), 4-point min/max model fit (xGetLMParameters,
IntraPrediction.cpp:1584), cclm_mode_flag/idx syntax — oracle
bit-exact."""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, hls
from fastintercu_vvc_tpu.ops import intra
from fastintercu_vvc_tpu.utils import trace

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def decode_yuv(bs, w, h, n=1):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per
        frames = []
        for t in range(n):
            f = out[t * per:(t + 1) * per]
            yy = f[:w * h].reshape(h, w).astype(int)
            cb = f[w * h:w * h + (w // 2) * (h // 2)].reshape(
                h // 2, w // 2).astype(int)
            cr = f[w * h + (w // 2) * (h // 2):].reshape(
                h // 2, w // 2).astype(int)
            frames.append((yy, cb, cr))
        return frames


def test_cclm_params_exact_line():
    # chroma = luma/2 + 100 exactly: the model must reproduce it
    lum = [200, 400, 600, 800]
    chr_ = [200, 300, 400, 500]
    a, b, sh = intra.cclm_params(lum, chr_)
    for l_, c in zip(lum, chr_):
        assert ((l_ * a) >> sh) + b == c


def test_cclm_allintra_bitexact():
    """Chroma strongly linear in luma: CCLM must win and decode
    bit-exactly (all three LM modes competing)."""
    w = h = 128
    qp = 30
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:h, 0:w]
    # heavy luma texture: chroma refs can't model it, but chroma is an
    # EXACT affine function of luma, so only CCLM predicts it
    y = np.clip(300 + 250 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
                + rng.randint(-120, 120, (h, w)), 0,
                1023).astype(np.int32)
    yd = (y[0::2, 0::2] + y[0::2, 1::2] + y[1::2, 0::2]
          + y[1::2, 1::2] + 2) >> 2
    u = np.clip((yd >> 1) + 200, 0, 1023).astype(np.int32)
    v = np.clip(900 - (yd >> 2), 0, 1023).astype(np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, cclm=True)
    fe = encoder.FrameEncoder(cfg)
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = fe.encode_frame((y, u, v), poc=0, qp=qp,
                                  slice_type=hls.I_SLICE)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    dy, dcb, dcr = decode_yuv(res.bitstream, w, h)[0]
    np.testing.assert_array_equal(dy, res.recon)
    np.testing.assert_array_equal(dcb, res.recon_cb)
    np.testing.assert_array_equal(dcr, res.recon_cr)
    assert any(e.get("cclm") for e in evs), "no CU chose CCLM"
