"""Explicit intra MTS (DST7/DCT8): selection, syntax, zero-out —
oracle bit-exact."""

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


def oracle_y(bitstream, w, h, n=1):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1200:]
        out = np.fromfile(yp, dtype="<u2")
        assert out.size == n * w * h
        return out.reshape(n, h, w).astype(int)


def content(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(512 + 200 * np.sin(xx / 9.0) + 150 * np.cos(yy / 7.0)
                   + rng.randint(-40, 40, (h, w)), 0, 1023).astype(np.int32)


@pytest.mark.parametrize("qp", [24, 34])
def test_mts_intra_qtmt_bitexact(qp):
    w = h = 128
    org = content(w, h, qp)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8,
                        qp=qp, mts_intra=True,
                        max_mtt_depth_intra=1, max_mtt_depth_inter=1)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(org, qp=qp)
    n_mts = sum(1 for k, (kind, t) in fe.cu_log.items()
                if kind == "intra" and t.get("mts_idx", 0))
    if qp <= 24:
        assert n_mts > 0, "MTS never selected at low QP"
    np.testing.assert_array_equal(oracle_y(r.bitstream, w, h)[0], r.recon)


def test_mts_32x32_lowqp_violation_path_bitexact():
    """At 32x32 / low QP DCT2 blocks carry coefficients beyond 16x16:
    the mts constraint suppresses mts_idx and the decoder must still
    follow (inferred DCT2)."""
    w = h = 64
    org = (np.random.RandomState(0)
           .randint(0, 1024, (h, w))).astype(np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=32, min_qt_inter=32,
                        qp=18, mts_intra=True)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=18)
    np.testing.assert_array_equal(oracle_y(r.bitstream, w, h)[0], r.recon)


def test_mts_420_ippp_bitexact():
    """MTS luma + DCT2 chroma in an inter GOP (intra CUs in P slices
    may pick MTS too)."""
    w = h = 128
    qp = 30
    rng = np.random.RandomState(2)
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(3):
        y = np.roll(content(w, h, 2), 2 * t, axis=1)
        y = np.clip(y + rng.randint(-6, 6, (h, w)), 0, 1023)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0), 0,
                    1023).astype(np.int32)
        frames.append((y.astype(np.int32), u, v))
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, mts_intra=True)
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


def test_max_bt_clamped_to_ctu():
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64)
    assert cfg.max_bt_inter == 64 and cfg.max_tt_inter == 64
