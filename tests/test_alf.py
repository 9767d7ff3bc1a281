"""ALF (luma, fixed filter sets): classification, 7x7 diamond
filtering with virtual-boundary handling, CTU syntax — oracle
bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, gop, hls
from fastintercu_vvc_tpu.ops import alf as alf_ops

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def test_fixed_filter_tables():
    f = alf_ops.fixed_filter_sets()
    assert f.shape == (16, 25, 12)
    # the diamond's off-centre coefficients must sum to a sensible
    # fraction of the 1<<7 DC weight (sanity, not normative)
    assert np.abs(f).max() < 1 << 7


def test_classification_shapes_and_range():
    rng = np.random.RandomState(0)
    plane = rng.randint(0, 1024, (128, 128)).astype(np.int32)
    cls, tr = alf_ops.classify(plane, 10, 64)
    assert cls.shape == (32, 32) and tr.shape == (32, 32)
    assert cls.min() >= 0 and cls.max() < 25
    assert tr.min() >= 0 and tr.max() < 4


def mk(w, h, seed=3, noise=15):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(512 + 300 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
                   + rng.randint(-noise, noise, (h, w)),
                   0, 1023).astype(np.int32)


def oracle_y(bs, w, h, n=1):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        assert out.size == n * w * h
        return out.reshape(n, h, w).astype(int)


@needs_oracle
@pytest.mark.parametrize("qp", [27, 37])
def test_alf_intra_multirow_bitexact(qp):
    """Two CTU rows -> the virtual-boundary paths are active."""
    w, h = 192, 128
    org = mk(w, h, qp)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=qp, alf=True)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=qp)
    np.testing.assert_array_equal(oracle_y(r.bitstream, w, h)[0],
                                  r.recon)


@needs_oracle
def test_alf_engages_and_helps():
    w, h = 192, 128
    qp = 37
    org = mk(w, h, 5)
    psnr = {}
    for alf in (False, True):
        cfg = hls.SeqConfig(width=w, height=h,
                            chroma_format=hls.CHROMA_400, ctu_size=64,
                            min_qt_intra=16, min_qt_inter=16, qp=qp,
                            alf=alf)
        r = encoder.FrameEncoder(cfg).encode_frame(org, qp=qp)
        np.testing.assert_array_equal(oracle_y(r.bitstream, w, h)[0],
                                      r.recon)
        mse = np.mean((r.recon - org).astype(float) ** 2)
        psnr[alf] = 10 * np.log10(1023 ** 2 / mse)
    assert psnr[True] >= psnr[False]


@needs_oracle
def test_alf_inter_420_with_sao_bitexact():
    w, h = 128, 128
    qp = 37
    rng = np.random.RandomState(2)
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(3):
        y = np.clip(np.roll(mk(w, h, 2), 2 * t, axis=1)
                    + rng.randint(-6, 6, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0), 0,
                    1023).astype(np.int32)
        frames.append((y, u, v))
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, alf=True, sao=True)
    res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=qp)
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(res.bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1200:]
        out = np.fromfile(yp, dtype="<u2")
    per = w * h + 2 * (w // 2) * (h // 2)
    for t in range(3):
        f = out[t * per:(t + 1) * per]
        np.testing.assert_array_equal(f[:w * h].reshape(h, w),
                                      res.recons[t].recon)


@needs_oracle
def test_alf_adaptive_aps_bitexact_and_helps():
    """Wiener-derived APS luma filters: the encoder signals an ALF APS
    (alf_luma_new_filter with merged classes) and the CTB filter index
    selects it; the oracle must decode bit-exact, and the adaptive
    filters must not lose PSNR vs fixed-sets-only at equal-ish rate."""
    w, h = 192, 128
    qp = 27
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:h, 0:w]
    org = np.clip(512 + 300 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
                  + rng.randint(-25, 25, (h, w)), 0,
                  1023).astype(np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=qp, alf=True)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(org, qp=qp)
    assert fe.alf_aps is not None, "APS derivation did not engage"
    np.testing.assert_array_equal(oracle_y(r.bitstream, w, h)[0],
                                  r.recon)
    # fixed-sets-only comparison
    from fastintercu_vvc_tpu.ops import alf as alf_ops
    cfg2 = hls.SeqConfig(width=w, height=h,
                         chroma_format=hls.CHROMA_400, ctu_size=64,
                         min_qt_intra=16, min_qt_inter=16, qp=qp,
                         alf=True)
    fe2 = encoder.FrameEncoder(cfg2)
    orig = alf_ops.estimate_frame

    def no_aps(*a, **k):
        k["use_aps"] = False
        return orig(*a, **k)
    alf_ops.estimate_frame = no_aps
    try:
        r2 = fe2.encode_frame(org, qp=qp)
    finally:
        alf_ops.estimate_frame = orig
    mse1 = np.mean((r.recon - org).astype(float) ** 2)
    mse2 = np.mean((r2.recon - org).astype(float) ** 2)
    # adaptive must win the RD comparison it was chosen by
    assert mse1 + 1e-9 <= mse2 or r.num_bits <= r2.num_bits


@needs_oracle
def test_alf_chroma_aps_bitexact():
    """Chroma ALF: APS-signalled 5x5 filter + per-CTB enable flags for
    Cb/Cr, oracle bit-exact on all three planes."""
    rng = np.random.RandomState(7)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(512 + 300 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
                + rng.randint(-25, 25, (h, w)), 0, 1023).astype(np.int32)
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    u = np.clip(512 + 180 * np.sin(cx / 9.0) * np.cos(cy / 7.0)
                + rng.randint(-20, 20, (h // 2, w // 2)), 0,
                1023).astype(np.int32)
    v = np.clip(512 - 140 * np.cos(cx / 8.0)
                + rng.randint(-20, 20, (h // 2, w // 2)), 0,
                1023).astype(np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        log2_min_cu=3, ctu_size=64, min_qt_intra=16,
                        min_qt_inter=16, qp=30, alf=True)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame((y, u, v), qp=30)
    assert fe.alf_chroma is not None, "chroma ALF did not engage"
    import tempfile
    import subprocess
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(r.bitstream)
        pr = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                            capture_output=True, timeout=300)
        assert pr.returncode == 0, pr.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
    ysz, csz = w * h, (w // 2) * (h // 2)
    np.testing.assert_array_equal(out[:ysz].reshape(h, w), r.recon)
    np.testing.assert_array_equal(
        out[ysz:ysz + csz].reshape(h // 2, w // 2), r.recon_cb)
    np.testing.assert_array_equal(
        out[ysz + csz:].reshape(h // 2, w // 2), r.recon_cr)


@needs_oracle
def test_ccalf_bitexact():
    # tool-mechanics test: pin the legacy lambda so the RD calibration
    # (FASTINTERCU_LAMBDA_SCALE) cannot price the tool out of selection
    # on this tiny clip
    import os
    os.environ["FASTINTERCU_LAMBDA_SCALE"] = "1"
    try:
        _run_ccalf()
    finally:
        os.environ.pop("FASTINTERCU_LAMBDA_SCALE", None)


def _run_ccalf():
    """CC-ALF: power-of-two cross-component filters signalled in the
    APS, per-CTB filter control, applied on top of chroma ALF from the
    pre-ALF luma — oracle bit-exact on all planes."""
    rng = np.random.RandomState(7)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(512 + 300 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
                + rng.randint(-25, 25, (h, w)), 0, 1023).astype(np.int32)
    yd = (y[0::2, 0::2] + y[0::2, 1::2] + y[1::2, 0::2]
          + y[1::2, 1::2] + 2) >> 2
    u = np.clip(512 + 0.3 * (yd - 512)
                + rng.randint(-15, 15, (h // 2, w // 2)), 0,
                1023).astype(np.int32)
    v = np.clip(512 - 0.25 * (yd - 512)
                + rng.randint(-15, 15, (h // 2, w // 2)), 0,
                1023).astype(np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        log2_min_cu=3, ctu_size=64, min_qt_intra=16,
                        min_qt_inter=16, qp=30, alf=True, ccalf=True)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame((y, u, v), qp=30)
    assert fe.ccalf, "CC-ALF did not engage"
    for ci, _ in fe.ccalf.values():
        for c in ci:
            a = abs(int(c))
            assert a == 0 or (a & (a - 1)) == 0 and a <= 64
    import tempfile
    import subprocess
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(r.bitstream)
        pr = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                            capture_output=True, timeout=300)
        assert pr.returncode == 0, pr.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
    ysz, csz = w * h, (w // 2) * (h // 2)
    np.testing.assert_array_equal(out[:ysz].reshape(h, w), r.recon)
    np.testing.assert_array_equal(
        out[ysz:ysz + csz].reshape(h // 2, w // 2), r.recon_cb)
    np.testing.assert_array_equal(
        out[ysz + csz:].reshape(h // 2, w // 2), r.recon_cr)


@needs_oracle
def test_alf_ctu128_bitexact():
    w = h = 128
    qp = 32
    org = mk(w, h, 9)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=128, min_qt_intra=32, min_qt_inter=32,
                        qp=qp, alf=True)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=qp)
    np.testing.assert_array_equal(oracle_y(r.bitstream, w, h)[0],
                                  r.recon)
