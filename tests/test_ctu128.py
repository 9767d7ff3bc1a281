"""CTU-128 support: CUs larger than the max transform size (64) carry
implicit 64x64 TU tiling (getMaxTuTiling, UnitPartitioner.cpp:1051;
transform_tree TU_MAX_TR_SPLIT, CABACReader.cpp:2546) — per-TU
prediction for intra, per-TU residual/cbf syntax, TU-accurate
deblocking edges. All oracle bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import batch_search, encoder, gop, hls

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def mk420(w, h, n, seed=4, shift=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        y = np.clip(512 + 220 * np.sin((xx - shift * t) / 13.0)
                    * np.cos((yy - t) / 17.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0),
                    0, 1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0),
                    0, 1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def decode_420(bitstream, w, h, n):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1200:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per
        frames = []
        for t in range(n):
            f = out[t * per:(t + 1) * per]
            frames.append((
                f[:w * h].reshape(h, w).astype(int),
                f[w * h:w * h + (w // 2) * (h // 2)]
                .reshape(h // 2, w // 2).astype(int),
                f[w * h + (w // 2) * (h // 2):]
                .reshape(h // 2, w // 2).astype(int)))
        return frames


def cfg128(w, h, qp):
    return hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                         ctu_size=128, min_qt_intra=32, min_qt_inter=32,
                         log2_min_cu=3, qp=qp)


def assert_frames_equal(dec, recons):
    for t, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(d[0], r.recon, err_msg=f"Y f{t}")
        np.testing.assert_array_equal(d[1], r.recon_cb, err_msg=f"Cb f{t}")
        np.testing.assert_array_equal(d[2], r.recon_cr, err_msg=f"Cr f{t}")


def test_forced_128_intra_cu_multi_tu_bitexact():
    """A forced no-split 128x128 intra CU: 4 sequential 64x64 TUs with
    per-TU prediction, plus internal TU-edge deblocking (BS 2)."""
    w = h = 128
    qp = 32
    cfg = cfg128(w, h, qp)
    frames = mk420(w, h, 1, seed=9)
    dec_map = batch_search.SearchDecisions(
        split={(0, 0, 128): False}, mode={(0, 0, 128): 30})
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(frames[0], qp=qp, decisions=dec_map)
    assert np.all(r.cu_map == ((128 << 16) | 128)), "CU must stay 128x128"
    dec = decode_420(r.bitstream, w, h, 1)
    assert_frames_equal(dec, [r])


@pytest.mark.parametrize("qp", [27, 37])
def test_ctu128_intra_rd_bitexact(qp):
    w, h = 256, 128
    cfg = cfg128(w, h, qp)
    frames = mk420(w, h, 1, seed=qp)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(frames[0], qp=qp)
    dec = decode_420(r.bitstream, w, h, 1)
    assert_frames_equal(dec, [r])


def test_ctu128_ippp_inter_bitexact():
    """P frames at CTU 128: 128-size merge/skip and AMVP CUs with
    multi-TU residuals."""
    w, h = 128, 128
    qp = 32
    cfg = cfg128(w, h, qp)
    frames = mk420(w, h, 3, seed=5)
    se = gop.SequenceEncoder(cfg, me_range=4)
    res = se.encode(frames, qp=qp)
    assert "P" in res.frame_types
    dec = decode_420(res.bitstream, w, h, 3)
    assert_frames_equal(dec, res.recons)


def test_ctu128_batched_search_bitexact():
    """Batched whole-frame search at CTU 128 (the MLT-CNN deployment
    geometry) + native-CABAC commit pass."""
    w, h = 256, 128
    qp = 32
    cfg = cfg128(w, h, qp)
    frames = mk420(w, h, 1, seed=2)
    dec_map = batch_search.search_intra_frame(frames[0][0], cfg, qp=qp)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(frames[0], qp=qp, decisions=dec_map)
    dec = decode_420(r.bitstream, w, h, 1)
    assert_frames_equal(dec, [r])


def test_ctu128_split_hints_contract():
    """split_hints forcing no-split at a 128 CTU root flows through to
    a 128x128 CU in the committed stream (setNewModeList parity)."""
    w, h = 256, 128
    qp = 32
    cfg = cfg128(w, h, qp)
    frames = mk420(w, h, 1, seed=3)
    hints = np.array([[0, 1]], np.int32)   # CTU0: no-split, CTU1: split
    dec_map = batch_search.search_intra_frame(frames[0][0], cfg, qp=qp,
                                              split_hints=hints)
    assert dec_map.split[(0, 0, 128)] is False
    assert dec_map.split[(128, 0, 128)] is True
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(frames[0], qp=qp, decisions=dec_map)
    assert np.all(r.cu_map[:, :32] == ((128 << 16) | 128))
    dec = decode_420(r.bitstream, w, h, 1)
    assert_frames_equal(dec, [r])
