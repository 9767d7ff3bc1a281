"""End-to-end bit-exactness: our encoder's bitstreams must decode under
the reference VTM-11 DecoderApp (oracle/) to exactly our reconstruction.

This is the executable spec (SURVEY.md §4): VTM decode == our recon.
Skipped when the oracle binary hasn't been built
(cmake -S oracle -B oracle/build && cmake --build oracle/build -j).
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import hls, intra_encoder

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def oracle_decode(bitstream: bytes, w: int, h: int) -> np.ndarray:
    with tempfile.TemporaryDirectory() as d:
        bin_path = os.path.join(d, "t.bin")
        yuv_path = os.path.join(d, "t.yuv")
        with open(bin_path, "wb") as f:
            f.write(bitstream)
        r = subprocess.run([ORACLE, "-b", bin_path, "-o", yuv_path],
                           capture_output=True, timeout=120)
        assert r.returncode == 0, r.stdout.decode()[-2000:]
        return np.fromfile(yuv_path, dtype="<u2").reshape(h, w).astype(int)


def make_content(kind, w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "smooth":
        org = (512 + 300 * np.sin(xx / 17.0) * np.cos(yy / 13.0))
    elif kind == "noise":
        org = rng.randint(0, 1024, (h, w))
    else:
        org = (512 + 200 * np.sin(xx / 9.0) + 150 * np.cos(yy / 7.0)
               + rng.randint(-30, 30, (h, w)))
    return np.clip(org, 0, 1023).astype(np.int32)


@pytest.mark.parametrize("qp", [22, 32, 42])
def test_intra_mvp_bitexact(qp):
    w, h = 192, 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=64, min_qt_inter=64,
                        log2_min_cu=6, qp=qp)
    org = make_content("mixed", w, h, qp)
    res = intra_encoder.IntraFrameEncoder(cfg).encode_frame(org, qp=qp)
    dec = oracle_decode(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)


@pytest.mark.parametrize("kind,qp", [("noise", 32), ("noise", 51),
                                     ("smooth", 27)])
def test_intra_mvp_bitexact_content(kind, qp):
    w, h = 128, 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=64, min_qt_inter=64,
                        log2_min_cu=6, qp=qp)
    org = make_content(kind, w, h, qp)
    res = intra_encoder.IntraFrameEncoder(cfg).encode_frame(org, qp=qp)
    dec = oracle_decode(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)
