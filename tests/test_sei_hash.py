"""Decoded-picture-hash SEI (MD5): the reference decoder must verify
every picture's hash and report (OK)."""

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


def run_decoder(bs):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        return r.stdout.decode()


def test_md5_sei_verified_by_reference_decoder_420():
    rng = np.random.RandomState(1)
    w = h = 128
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(3):
        y = np.clip(512 + 220 * np.sin((xx - 3 * t) / 13.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0), 0,
                    1023).astype(np.int32)
        frames.append((y, u, v))
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=32, picture_hash=True)
    res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=32)
    out = run_decoder(res.bitstream)
    assert out.count("(OK)") == 3, out[-800:]
    assert "(unk)" not in out


def test_md5_sei_single_component_400():
    rng = np.random.RandomState(2)
    w, h = 64, 64
    org = rng.randint(200, 800, (h, w)).astype(np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=32, picture_hash=True)
    r = encoder.FrameEncoder(cfg).encode_frame(org, qp=32)
    out = run_decoder(r.bitstream)
    assert out.count("(OK)") == 1, out[-800:]
