"""Joint CbCr residual coding (ICT): fwd/inv color transform modes
1/2/3 (TrQuant.cpp fwdTransformCbCr/invTransformCbCr, sign flag 0),
tu_joint_cbcr_residual_flag syntax (CABACWriter.cpp:2611) — oracle
bit-exact."""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, gop, hls
from fastintercu_vvc_tpu.utils import trace

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def decode_yuv(bs, w, h, n=1):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per
        frames = []
        for t in range(n):
            f = out[t * per:(t + 1) * per]
            frames.append((
                f[:w * h].reshape(h, w).astype(int),
                f[w * h:w * h + (w // 2) * (h // 2)].reshape(
                    h // 2, w // 2).astype(int),
                f[w * h + (w // 2) * (h // 2):].reshape(
                    h // 2, w // 2).astype(int)))
        return frames


def mk_correlated(w, h, n, seed=19):
    """Cb and Cr share the same structure (resCr == resCb after any
    smooth prediction): the mask-3 joint residual halves the rate."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        y = np.clip(512 + 200 * np.sin((xx - 2 * t) / 10.0)
                    + rng.randint(-5, 5, (h, w)), 0, 1023).astype(np.int32)
        tex = 90 * np.sin((cx - t) / 3.0) * np.cos(cy / 4.0)
        u = np.clip(430 + tex, 0, 1023).astype(np.int32)
        v = np.clip(590 + tex, 0, 1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def test_joint_cbcr_allintra_bitexact():
    w = h = 128
    qp = 32
    frames = mk_correlated(w, h, 1)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, joint_cbcr=True)
    fe = encoder.FrameEncoder(cfg)
    res = fe.encode_frame(frames[0], poc=0, qp=qp,
                          slice_type=hls.I_SLICE)
    joint_used = sum(tu.get("joint_cbcr", 0) != 0
                     for _, (k, t) in fe.cu_log.items()
                     for tu in t["tus"])
    dy, dcb, dcr = decode_yuv(res.bitstream, w, h)[0]
    np.testing.assert_array_equal(dy, res.recon)
    np.testing.assert_array_equal(dcb, res.recon_cb)
    np.testing.assert_array_equal(dcr, res.recon_cr)
    assert joint_used > 0, "no TU chose joint CbCr"


def test_joint_cbcr_inter_bitexact():
    w = h = 128
    qp = 33
    frames = mk_correlated(w, h, 4, seed=29)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, joint_cbcr=True,
                        mmvd=True, deblocking=True)
    res = gop.SequenceEncoder(cfg, me_range=8).encode(frames, qp=qp)
    dec = decode_yuv(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t][0], res.recons[t].recon)
        np.testing.assert_array_equal(dec[t][1], res.recons[t].recon_cb)
        np.testing.assert_array_equal(dec[t][2], res.recons[t].recon_cr)
