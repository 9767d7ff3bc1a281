"""Dependent quantization: greedy state-following quantizer + exact
state-walked dequant, residual coding with the 4-state context model —
oracle bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, gop, hls
from fastintercu_vvc_tpu.ops import transforms_np as tnp

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def test_quant_dequant_dep_roundtrip_states():
    """The greedy quantizer must produce levels whose state-walked
    dequant reconstructs near the original coefficients (within the
    deadzone-widened zero threshold)."""
    from fastintercu_vvc_tpu.ops import rom
    from fastintercu_vvc_tpu.ops.quant import (QUANT_SHIFT,
                                               transform_shift,
                                               _needs_sqrt2)
    rng = np.random.RandomState(0)
    qp = 38
    for (w, h) in ((4, 4), (8, 8), (16, 8), (32, 32)):
        c = rng.randint(-2000, 2000, (h, w)).astype(np.int64)
        c[h // 2:, :] //= 50
        q = tnp.quant_dep(c.astype(np.int32), qp)
        dq = tnp.dequant_dep(q, qp)
        lw, lh = w.bit_length() - 1, h.bit_length() - 1
        sq = _needs_sqrt2(lw, lh)
        per, rem = (qp + 1) // 6, (qp + 1) % 6
        scale = int(np.asarray(rom.quant_scales())[1 if sq else 0][rem])
        qshift = QUANT_SHIFT - 1 + per + transform_shift(10, lw, lh) \
            - (1 if sq else 0)
        half_step = (1 << qshift) / scale      # coeff units
        # zero threshold = step + pen/2 ~ 1.67 half-steps x2
        assert np.abs(dq - c).max() <= 2.5 * 2 * half_step + 4


def test_dequant_dep_state_dependence():
    """The same level decodes differently depending on the parity of
    preceding levels (the core dep-quant property)."""
    q1 = np.zeros((4, 4), np.int32)
    q1[0, 0] = 2
    q1[0, 1] = 2          # even -> state stays in {0,1} branch
    q2 = np.zeros((4, 4), np.int32)
    q2[0, 0] = 2
    q2[0, 1] = 1          # odd parity changes the state at DC
    d1 = tnp.dequant_dep(q1, 32)
    d2 = tnp.dequant_dep(q2, 32)
    assert d1[0, 0] != d2[0, 0] or d1[0, 1] != d2[0, 1]


def mk(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(512 + 200 * np.sin(xx / 9.0) + 150 * np.cos(yy / 7.0)
                   + rng.randint(-40, 40, (h, w)), 0, 1023).astype(np.int32)


@needs_oracle
@pytest.mark.parametrize("qp", [27, 37])
def test_depquant_intra_bitexact(qp):
    w = h = 128
    org = mk(w, h, qp)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=qp, dep_quant=True)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=qp)
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(r.bitstream)
        rr = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                            capture_output=True, timeout=120)
        assert rr.returncode == 0, rr.stdout.decode()[-1200:]
        dec = np.fromfile(yp, dtype="<u2")
        assert dec.size == w * h
    np.testing.assert_array_equal(dec.reshape(h, w).astype(int), r.recon)


@needs_oracle
def test_depquant_inter_420_bitexact():
    w = h = 128
    qp = 32
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
                        log2_min_cu=3, qp=qp, dep_quant=True)
    res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=qp)
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(res.bitstream)
        rr = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                            capture_output=True, timeout=300)
        assert rr.returncode == 0, rr.stdout.decode()[-1200:]
        out = np.fromfile(yp, dtype="<u2")
    per = w * h + 2 * (w // 2) * (h // 2)
    assert out.size == 3 * per
    for t in range(3):
        f = out[t * per:(t + 1) * per]
        np.testing.assert_array_equal(f[:w * h].reshape(h, w),
                                      res.recons[t].recon)
        np.testing.assert_array_equal(
            f[w * h:w * h + (w // 2) ** 2].reshape(h // 2, w // 2),
            res.recons[t].recon_cb)


@needs_oracle
def test_depquant_with_mts_bitexact():
    w = h = 64
    qp = 27
    org = mk(w, h, 5)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=qp, dep_quant=True, mts_intra=True)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=qp)
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(r.bitstream)
        rr = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                            capture_output=True, timeout=120)
        assert rr.returncode == 0, rr.stdout.decode()[-1200:]
        dec = np.fromfile(yp, dtype="<u2")
        assert dec.size == w * h
    np.testing.assert_array_equal(dec.reshape(h, w).astype(int), r.recon)
