"""Transform skip (luma 4x4, regular residual coding with TSRC
disabled): selection, ts_flag syntax, TS quant with the QP-prime-TS
clamp — oracle bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, hls

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def screen_content(w, h, seed=1):
    rng = np.random.RandomState(seed)
    org = np.full((h, w), 200, np.int32)
    org[::8, :] = 900
    org[:, ::8] = 900
    org[16:32, 16:48] = rng.choice([100, 900], size=(16, 32))
    return org


def oracle_y(bs, w, h):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=120)
        assert r.returncode == 0, r.stdout.decode()[-1200:]
        out = np.fromfile(yp, dtype="<u2")
        assert out.size == w * h
        return out.reshape(h, w).astype(int)


def test_ts_selected_and_bitexact_on_screen_content():
    w = h = 64
    org = screen_content(w, h)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=4, min_qt_inter=8,
                        qp=30, transform_skip=True)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(org, qp=30)
    n_ts = sum(1 for k, (kind, t) in fe.cu_log.items()
               if kind == "intra" and t["tus"][0].get("ts"))
    assert n_ts > 0, "TS never chosen on screen content"
    np.testing.assert_array_equal(oracle_y(r.bitstream, w, h), r.recon)


def test_ts_beats_dct2_on_screen_content():
    w = h = 64
    org = screen_content(w, h)
    out = {}
    for ts in (False, True):
        cfg = hls.SeqConfig(width=w, height=h,
                            chroma_format=hls.CHROMA_400, ctu_size=64,
                            min_qt_intra=4, min_qt_inter=8, qp=30,
                            transform_skip=ts)
        r = encoder.FrameEncoder(cfg).encode_frame(org, qp=30)
        mse = np.mean((r.recon - org).astype(float) ** 2)
        out[ts] = (r.num_bits, mse)
    assert out[True][0] < out[False][0]       # fewer bits
    assert out[True][1] <= out[False][1]      # no worse quality


def test_ts_with_chroma_flags_bitexact():
    """4:2:0 with 4x4 chroma TBs: chroma ts_flag (0) must be written
    wherever TS is allowed for the chroma TB."""
    rng = np.random.RandomState(3)
    w = h = 64
    y = screen_content(w, h, 3)
    u = rng.choice([100, 900], size=(h // 2, w // 2)).astype(np.int32)
    v = np.full((h // 2, w // 2), 512, np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8,
                        log2_min_cu=3, qp=30, transform_skip=True)
    r = encoder.FrameEncoder(cfg).encode_frame((y, u, v), qp=30)
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(r.bitstream)
        rr = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                            capture_output=True, timeout=120)
        assert rr.returncode == 0, rr.stdout.decode()[-1200:]
        out = np.fromfile(yp, dtype="<u2")
    per = w * h + 2 * (w // 2) * (h // 2)
    assert out.size == per
    np.testing.assert_array_equal(out[:w * h].reshape(h, w), r.recon)
    np.testing.assert_array_equal(
        out[w * h:w * h + (w // 2) ** 2].reshape(h // 2, w // 2),
        r.recon_cb)


def test_ts_with_mts_enabled_bitexact():
    w = h = 64
    org = screen_content(w, h, 5)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=4, min_qt_inter=8,
                        qp=27, transform_skip=True, mts_intra=True)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=27)
    np.testing.assert_array_equal(oracle_y(r.bitstream, w, h), r.recon)
