"""Sign data hiding: hidden first sign per qualifying coding group
(CABACWriter.cpp:3011, Quant::xSignBitHidingHDQ parity fixer,
sh_sign_data_hiding_used_flag) — oracle bit-exact."""

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


def decode_y(bs, w, h, n):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per
        return [out[t * per:t * per + w * h].reshape(h, w).astype(int)
                for t in range(n)]


def mk(w, h, n, seed=91):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        # dense texture: lots of nonzero levels per coding group, so
        # SDH actually hides signs
        y = np.clip(512 + 280 * np.sin((xx - 2 * t) / 5.0)
                    * np.cos((yy + t) / 4.0)
                    + rng.randint(-25, 25, (h, w)), 0,
                    1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 4.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy + t) / 5.0), 0,
                    1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def test_sdh_allintra_bitexact():
    w = h = 128
    qp = 27
    frames = mk(w, h, 1)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, sign_data_hiding=True)
    fe = encoder.FrameEncoder(cfg)
    res = fe.encode_frame(frames[0], poc=0, qp=qp,
                          slice_type=hls.I_SLICE)
    dec = decode_y(res.bitstream, w, h, 1)[0]
    np.testing.assert_array_equal(dec, res.recon)
    # SDH must save bits vs the same encode without it
    cfg2 = hls.SeqConfig(width=w, height=h,
                         chroma_format=hls.CHROMA_420, ctu_size=64,
                         min_qt_intra=8, min_qt_inter=16,
                         log2_min_cu=3, qp=qp)
    res2 = encoder.FrameEncoder(cfg2).encode_frame(
        frames[0], poc=0, qp=qp, slice_type=hls.I_SLICE)
    assert res.num_bits < res2.num_bits


def test_sdh_inter_bitexact():
    w = h = 128
    qp = 30
    frames = mk(w, h, 4, seed=97)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, sign_data_hiding=True,
                        deblocking=True, mmvd=True, sbt=True)
    res = gop.SequenceEncoder(cfg, me_range=8).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
