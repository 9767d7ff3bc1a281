"""Deblocking filter tests — oracle bit-exactness with filtering active."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, gop, hls

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def _decode(bitstream, w, h, n, chroma):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1200:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h * (3 if chroma else 2) // (2 if chroma else 2)
        per = w * h + (w * h // 2 if chroma else 0)
        assert out.size == n * per
        return out, per


def _content(w, h, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    org = np.clip(400 + 300 * np.sin(xx / 15.0) * np.sin(yy / 11.0)
                  + rng.randint(-15, 15, (h, w)), 0, 1023).astype(np.int32)
    return org


def test_deblock_modifies_and_is_bitexact_400():
    w = h = 128
    base = dict(width=w, height=h, chroma_format=hls.CHROMA_400,
                ctu_size=64, min_qt_intra=16, min_qt_inter=16, qp=37)
    org = _content(w, h)
    r_off = encoder.FrameEncoder(
        hls.SeqConfig(**base, deblocking=False)).encode_frame(org)
    r_on = encoder.FrameEncoder(
        hls.SeqConfig(**base, deblocking=True)).encode_frame(org)
    assert (r_off.recon != r_on.recon).sum() > 0, "filter never engaged"
    out, per = _decode(r_on.bitstream, w, h, 1, chroma=False)
    np.testing.assert_array_equal(out[:w * h].reshape(h, w), r_on.recon)


@pytest.mark.parametrize("min_qt", [16, 32])
def test_deblock_420_gop_bitexact(min_qt):
    w = h = 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=min_qt,
                        min_qt_inter=min_qt, log2_min_cu=3, qp=35,
                        deblocking=True)
    rng = np.random.RandomState(4)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(3):
        y = np.clip(512 + 220 * np.sin((xx - 1.5 * t) / 13.0)
                    * np.cos((yy - 0.7 * t) / 17.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0)
                    + rng.randint(-6, 6, (h // 2, w // 2)),
                    0, 1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - 0.5 * t) / 6.0)
                    + rng.randint(-6, 6, (h // 2, w // 2)),
                    0, 1023).astype(np.int32)
        frames.append((y, u, v))
    se = gop.SequenceEncoder(cfg, me_range=5)
    res = se.encode(frames)
    out, per = _decode(res.bitstream, w, h, 3, chroma=True)
    for t in range(3):
        f = out[t * per:(t + 1) * per]
        rr = res.recons[t]
        np.testing.assert_array_equal(f[:w * h].reshape(h, w), rr.recon)
        cs = (w // 2) * (h // 2)
        np.testing.assert_array_equal(
            f[w * h:w * h + cs].reshape(h // 2, w // 2), rr.recon_cb)
        np.testing.assert_array_equal(
            f[w * h + cs:].reshape(h // 2, w // 2), rr.recon_cr)


def test_native_deblock_matches_python():
    """native/loopfilter.c is a bit-exact twin of the numpy deblocker
    on a real encoded frame (inter + chroma + TU geometry)."""
    from fastintercu_vvc_tpu.ops import deblock
    from fastintercu_vvc_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")

    captured = []
    orig = deblock.deblock_frame

    def cap(ry, rcb, rcr, info, qp, qpc, bit_depth=10, ctu_size=64,
            force_python=False):
        y0 = ry.copy()
        cb0 = rcb.copy() if rcb is not None else None
        cr0 = rcr.copy() if rcr is not None else None
        deblock._deblock_frame_py(ry, rcb, rcr, info, qp, qpc,
                                  bit_depth, ctu_size)
        ryn = y0.copy()
        rcbn = cb0.copy() if cb0 is not None else None
        rcrn = cr0.copy() if cr0 is not None else None
        ok = native.lf_deblock_frame(ryn, rcbn, rcrn, info, qp, qpc,
                                     bit_depth, ctu_size)
        assert ok
        assert np.array_equal(ry, ryn)
        if rcb is not None:
            assert np.array_equal(rcb, rcbn)
            assert np.array_equal(rcr, rcrn)
        captured.append(1)

    deblock.deblock_frame = cap
    try:
        w, h = 128, 96
        rng = np.random.RandomState(11)
        frames = []
        base = _content(w, h)
        for t in range(3):
            y = np.roll(base, 2 * t, axis=1)
            u = np.clip(512 + (y[::2, ::2] - 512) // 4, 0, 1023)
            v = np.clip(512 - (y[::2, ::2] - 512) // 5, 0, 1023)
            frames.append((y, u, v))
        cfg = hls.SeqConfig(width=w, height=h,
                            chroma_format=hls.CHROMA_420, ctu_size=64,
                            log2_min_cu=3,
                            deblocking=True, sao=False, alf=False,
                            sign_data_hiding=True)
        enc = gop.SequenceEncoder(cfg, num_refs=1)
        enc.encode(frames, qp=30)
    finally:
        deblock.deblock_frame = orig
    assert captured, "deblock never invoked"


def test_native_intra_sdh_matches_python():
    """ck_eval_intra with the SDH flag == the numpy _tq path
    (bitstream-identical I-frame)."""
    from fastintercu_vvc_tpu import native as nat
    if nat._ck() is None:
        pytest.skip("native lib unavailable")
    org = _content(128, 64, seed=5)
    cfg = hls.SeqConfig(width=128, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        sign_data_hiding=True, mts_intra=True,
                        deblocking=False, sao=False, alf=False)
    fe = encoder.FrameEncoder(cfg)
    r1 = fe.encode_frame(org, poc=0, qp=30, slice_type=hls.I_SLICE)
    orig_ck = nat._ck
    nat._ck = lambda: None
    try:
        fe2 = encoder.FrameEncoder(cfg)
        r2 = fe2.encode_frame(org, poc=0, qp=30, slice_type=hls.I_SLICE)
    finally:
        nat._ck = orig_ck
    assert r1.bitstream == r2.bitstream
    assert np.array_equal(r1.recon, r2.recon)
