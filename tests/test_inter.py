"""Inter-path tests: P-slices, AMVP/MVD, MC interpolation, GOP streams —
all verified bit-exact against the VTM oracle decoder."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, gop, hls
from fastintercu_vvc_tpu.ops import inter

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")

needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def oracle_decode_n(bitstream, w, h, n):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        assert out.size == n * w * h, r.stdout.decode()[-800:]
        return out.reshape(n, h, w).astype(int)


def moving_frames(w, h, n, seed=4):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        f = (512 + 220 * np.sin((xx - 1.5 * t) / 13.0)
             * np.cos((yy - 0.7 * t) / 17.0)
             + 100 * np.sin((xx + yy - 2 * t) / 9.0))
        frames.append(np.clip(f + rng.randint(-6, 6, (h, w)),
                              0, 1023).astype(np.int32))
    return frames


def test_mv_precision_roundtrip():
    for v in (-100, -5, -4, -1, 0, 1, 3, 4, 100, 257):
        q = inter.mv_internal_to_quarter(v << 2)
        assert inter.mv_quarter_to_internal(q) == (v << 2)
    # rounding parity with Mv::divideByPowerOf2
    assert inter.mv_round_to_quarter(5) == 4
    assert inter.mv_round_to_quarter(-5) == -4
    assert inter.mv_round_to_quarter(6) == 4    # (6+2-1)>>2<<2
    assert inter.mv_round_to_quarter(7) == 8
    assert inter.mv_round_to_quarter(-6) == -4


def test_mc_luma_integer_is_copy():
    rng = np.random.RandomState(0)
    ref = rng.randint(0, 1024, (64, 64)).astype(np.int32)
    out = inter.mc_luma(ref, 8, 8, 16, 16, (3 << 4, -2 << 4))
    np.testing.assert_array_equal(out, ref[6:22, 11:27])


def test_mc_luma_half_pel_symmetry():
    """Half-pel filter is symmetric: filtering a constant plane returns
    the constant."""
    ref = np.full((32, 32), 700, np.int32)
    out = inter.mc_luma(ref, 8, 8, 8, 8, (8, 8))   # (0.5, 0.5) pel
    np.testing.assert_array_equal(out, np.full((8, 8), 700))


def test_hmvp_update_rules():
    mk = lambda i: inter.MotionInfo(1, (i, i), (0, 0), 0, -1)
    lut = []
    for i in range(7):
        inter.hmvp_update(lut, mk(i))
    assert len(lut) == inter.MAX_NUM_HMVP_CANDS
    assert lut[-1] == mk(6) and lut[0] == mk(2)
    inter.hmvp_update(lut, mk(4))     # duplicate moves to back
    assert lut[-1] == mk(4) and len(lut) == inter.MAX_NUM_HMVP_CANDS


@needs_oracle
def test_ippp_gop_bitexact():
    w = h = 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=32)
    frames = moving_frames(w, h, 4)
    se = gop.SequenceEncoder(cfg, me_range=6)
    res = se.encode(frames)
    dec = oracle_decode_n(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"frame {t}")
    assert res.frame_types == ["I", "P", "P", "P"]
    # P frames should beat intra coding cost on this content
    assert res.frame_bits[1] < res.frame_bits[0]


@needs_oracle
def test_p_frame_partition_search_bitexact():
    w = h = 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8,
                        qp=30)
    frames = moving_frames(w, h, 2, seed=9)
    # localized change forces mixed intra/inter + splits
    frames[1][20:44, 20:44] = np.random.RandomState(1).randint(
        0, 1024, (24, 24))
    se = gop.SequenceEncoder(cfg, me_range=4)
    res = se.encode(frames)
    dec = oracle_decode_n(res.bitstream, w, h, 2)
    for t in range(2):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon)


@needs_oracle
def test_random_access_hierarchical_b_bitexact():
    w = h = 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=32, num_reorder_pics=2, max_dec_pic_buffering=5)
    frames = moving_frames(w, h, 5)
    rae = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=5)
    res = rae.encode(frames)
    assert res.frame_types == ["I", "B", "B", "B", "P"]
    dec = oracle_decode_n(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"poc {t}")


@needs_oracle
def test_random_access_gop8_420_deblock_bitexact():
    w, h = 128, 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=34, deblocking=True,
                        num_reorder_pics=3, max_dec_pic_buffering=6)
    rng = np.random.RandomState(4)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(9):
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
    rae = gop.RandomAccessEncoder(cfg, gop_size=8, me_range=5)
    res = rae.encode(frames)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(res.bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0
        out = np.fromfile(yp, dtype="<u2")
    per = w * h * 3 // 2
    assert out.size == 9 * per
    csz = (w // 2) * (h // 2)
    for t in range(9):
        f = out[t * per:(t + 1) * per]
        rr = res.recons[t]
        np.testing.assert_array_equal(f[:w * h].reshape(h, w), rr.recon)
        np.testing.assert_array_equal(
            f[w * h:w * h + csz].reshape(h // 2, w // 2), rr.recon_cb)
        np.testing.assert_array_equal(
            f[w * h + csz:].reshape(h // 2, w // 2), rr.recon_cr)
