"""Everything-on integration: all implemented coding tools enabled in
one random-access stream — oracle bit-exact. The broadest single
interaction test in the suite (tool-combination bugs surface here
first)."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def test_all_tools_random_access_bitexact():
    w = h = 128
    qp = 32
    rng = np.random.RandomState(101)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    frames = []
    for t in range(5):
        gain = 0.9 ** t
        y = np.clip(gain * (512 + 280 * np.sin((xx - 2.3 * t) / 8.0)
                            * np.cos((yy + 1.2 * t) / 10.0))
                    + rng.randint(-10, 10, (h, w)), 0,
                    1023).astype(np.int32)
        yd = (y[0::2, 0::2] + y[0::2, 1::2] + y[1::2, 0::2]
              + y[1::2, 1::2] + 2) >> 2
        u = np.clip((yd >> 1) + 200 + 60 * np.sin((cx - t) / 6.0),
                    0, 1023).astype(np.int32)
        v = np.clip(850 - (yd >> 2) - 50 * np.cos((cy + t) / 7.0),
                    0, 1023).astype(np.int32)
        frames.append((y, u, v))
    cfg = hls.SeqConfig(
        width=w, height=h, chroma_format=hls.CHROMA_420, ctu_size=64,
        min_qt_intra=8, min_qt_inter=8, log2_min_cu=3, qp=qp,
        max_mtt_depth_intra=1, max_mtt_depth_inter=1,
        # every implemented tool at once
        mmvd=True, smvd=True, bcw=True, amvr=True, ciip=True, geo=True,
        temporal_mvp=True, sbtmvp=True, bdof=True, dmvr=True,
        affine=True, affine_type=True, prof=True,
        mts_intra=True, sbt=True, joint_cbcr=True,
        mrl=True, cclm=True, mip=True, lfnst=True, isp=True,
        sign_data_hiding=True, deblocking=True,
        sao=True, alf=True, picture_hash=True,
        num_reorder_pics=2, max_dec_pic_buffering=5)
    res = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=8,
                                  mctf=True).encode(frames, qp=qp)
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(res.bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=600)
        assert r.returncode == 0, r.stdout.decode()[-2000:]
        log = r.stdout.decode()
        assert "[MD5:OK" in log or "OK" in log     # hash SEI verified
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == 5 * per
        for t in range(5):
            f = out[t * per:(t + 1) * per]
            np.testing.assert_array_equal(
                f[:w * h].reshape(h, w).astype(int),
                res.recons[t].recon, err_msg=f"f{t} luma")
            np.testing.assert_array_equal(
                f[w * h:w * h + per // 6].reshape(h // 2, w // 2)
                .astype(int), res.recons[t].recon_cb,
                err_msg=f"f{t} cb")
            np.testing.assert_array_equal(
                f[w * h + per // 6:].reshape(h // 2, w // 2)
                .astype(int), res.recons[t].recon_cr,
                err_msg=f"f{t} cr")
