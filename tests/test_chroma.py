"""4:2:0 chroma path tests — oracle bit-exactness on all three planes."""

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


def mk420(w, h, n, seed=4):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        y = np.clip(512 + 220 * np.sin((xx - 1.5 * t) / 13.0)
                    * np.cos((yy - 0.7 * t) / 17.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0)
                    + rng.randint(-6, 6, (h // 2, w // 2)),
                    0, 1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - 0.5 * t) / 6.0)
                    + rng.randint(-6, 6, (h // 2, w // 2)),
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


@pytest.mark.parametrize("qp", [22, 32, 42])
def test_chroma_gop_bitexact(qp):
    w, h = 128, 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp)
    frames = mk420(w, h, 3, seed=qp)
    se = gop.SequenceEncoder(cfg, me_range=5)
    res = se.encode(frames, qp=qp)
    dec = decode_420(res.bitstream, w, h, 3)
    for t in range(3):
        rr = res.recons[t]
        np.testing.assert_array_equal(dec[t][0], rr.recon)
        np.testing.assert_array_equal(dec[t][1], rr.recon_cb)
        np.testing.assert_array_equal(dec[t][2], rr.recon_cr)


def test_chroma_qp_table():
    tab = encoder.chroma_qp_table(10)
    # identity through 26+offset; slope-1 compression above 26
    assert tab[26 + 12] == 26
    assert tab[20 + 12] == 20
    assert tab[27 + 12] == 26
    assert tab[32 + 12] == 31
    assert tab[63 + 12] == 62
