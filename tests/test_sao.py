"""SAO: normative application + syntax, oracle bit-exact; estimation
must not lose PSNR."""

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


def mk420(w, h, n, seed=4):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        y = np.clip(512 + 220 * np.sin((xx - 3 * t) / 13.0)
                    * np.cos((yy - t) / 17.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0)
                    + rng.randint(-5, 5, (h // 2, w // 2)),
                    0, 1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0)
                    + rng.randint(-5, 5, (h // 2, w // 2)),
                    0, 1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def oracle(bitstream, n_pix_per_frame, n):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        assert out.size == n * n_pix_per_frame
        return out


def check_420(res, w, h, n):
    out = oracle(res.bitstream, w * h + (w // 2) * (h // 2) * 2, n)
    per = w * h + (w // 2) * (h // 2) * 2
    for t in range(n):
        f = out[t * per:(t + 1) * per]
        r = res.recons[t] if hasattr(res, "recons") else res
        np.testing.assert_array_equal(
            f[:w * h].reshape(h, w), r.recon, err_msg=f"Y f{t}")
        np.testing.assert_array_equal(
            f[w * h:w * h + (w // 2) * (h // 2)].reshape(h // 2, w // 2),
            r.recon_cb, err_msg=f"Cb f{t}")
        np.testing.assert_array_equal(
            f[w * h + (w // 2) * (h // 2):].reshape(h // 2, w // 2),
            r.recon_cr, err_msg=f"Cr f{t}")


@pytest.mark.parametrize("qp", [27, 37])
def test_sao_ippp_420_bitexact(qp):
    w = h = 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, sao=True)
    frames = mk420(w, h, 3, seed=qp)
    res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=qp)
    check_420(res, w, h, 3)


def test_sao_improves_or_matches_psnr():
    w = h = 128
    qp = 37
    frames = mk420(w, h, 2, seed=1)
    psnr = {}
    for sao in (False, True):
        cfg = hls.SeqConfig(width=w, height=h,
                            chroma_format=hls.CHROMA_420, ctu_size=64,
                            min_qt_intra=16, min_qt_inter=16,
                            log2_min_cu=3, qp=qp, sao=sao)
        res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=qp)
        mse = np.mean([np.mean((r.recon - f[0]).astype(float) ** 2)
                       for r, f in zip(res.recons, frames)])
        psnr[sao] = 10 * np.log10(1023 ** 2 / mse)
    assert psnr[True] >= psnr[False], psnr


def test_sao_400_intra_bitexact():
    w, h = 192, 128
    qp = 32
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=qp, sao=True)
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:h, 0:w]
    org = np.clip(512 + 200 * np.sin(xx / 9.0) + 150 * np.cos(yy / 7.0)
                  + rng.randint(-30, 30, (h, w)), 0, 1023).astype(np.int32)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=qp)
    out = oracle(r.bitstream, w * h, 1)
    np.testing.assert_array_equal(out.reshape(h, w), r.recon)


def test_sao_batched_decisions_bitexact():
    """SAO on top of the batched search + replay commit pass."""
    w, h = 128, 64
    qp = 32
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=qp, sao=True)
    rng = np.random.RandomState(5)
    org = rng.randint(200, 800, (h, w)).astype(np.int32)
    dec = batch_search.search_intra_frame(org, cfg, qp)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=qp, decisions=dec)
    out = oracle(r.bitstream, w * h, 1)
    np.testing.assert_array_equal(out.reshape(h, w), r.recon)


def test_sao_ctu128_bitexact():
    w, h = 256, 128
    qp = 37
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=128, min_qt_intra=32, min_qt_inter=32,
                        log2_min_cu=3, qp=qp, sao=True)
    frames = mk420(w, h, 2, seed=8)
    res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=qp)
    check_420(res, w, h, 2)


def test_replay_without_sao_bitexact():
    """two_pass replay alone (the encodeSlice analogue) stays valid."""
    w = h = 128
    qp = 32
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp,
                        num_reorder_pics=2, max_dec_pic_buffering=5)
    frames = mk420(w, h, 5, seed=2)
    res = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=4,
                                  two_pass=True).encode(frames, qp=qp)
    check_420(res, w, h, 5)
