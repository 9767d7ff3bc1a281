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


def _clip(w, h, n=5, seed=101):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:(h + 1) // 2, 0:(w + 1) // 2]
    frames = []
    for t in range(n):
        gain = 0.9 ** t
        y = np.clip(gain * (512 + 280 * np.sin((xx - 2.3 * t) / 8.0)
                            * np.cos((yy + 1.2 * t) / 10.0))
                    + rng.randint(-10, 10, (h, w)), 0,
                    1023).astype(np.int32)
        y2 = y[:h // 2 * 2, :w // 2 * 2]
        yd = (y2[0::2, 0::2] + y2[0::2, 1::2] + y2[1::2, 0::2]
              + y2[1::2, 1::2] + 2) >> 2
        u = np.clip((yd >> 1) + 200
                    + 60 * np.sin((cx[:h // 2, :w // 2] - t) / 6.0),
                    0, 1023).astype(np.int32)
        v = np.clip(850 - (yd >> 2)
                    - 50 * np.cos((cy[:h // 2, :w // 2] + t) / 7.0),
                    0, 1023).astype(np.int32)
        frames.append((y, u, v))
    return frames


def _check(res, w, h, n):
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
        assert out.size == n * per
        for t in range(n):
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


def _all_tools_cfg(w, h, qp, **kw):
    base = dict(
        width=w, height=h, chroma_format=hls.CHROMA_420, ctu_size=64,
        min_qt_intra=8, min_qt_inter=8, log2_min_cu=3, qp=qp,
        max_mtt_depth_intra=1, max_mtt_depth_inter=1,
        # every implemented tool at once
        mmvd=True, smvd=True, bcw=True, amvr=True, ciip=True, geo=True,
        temporal_mvp=True, sbtmvp=True, bdof=True, dmvr=True,
        affine=True, affine_type=True, prof=True,
        mts_intra=True, sbt=True, joint_cbcr=True,
        mrl=True, cclm=True, mip=True, lfnst=True, isp=True,
        # CTC runs DepQuant (which supersedes SDH; SDH+TS is an
        # excluded combination in the TU coder)
        sign_data_hiding=False, deblocking=True,
        sao=True, alf=True, ccalf=True, picture_hash=True,
        lmcs=True, dep_quant=True, transform_skip=True,
        num_reorder_pics=2, max_dec_pic_buffering=5)
    base.update(kw)
    return hls.SeqConfig(**base)


def test_all_tools_random_access_bitexact():
    w = h = 128
    qp = 32
    frames = _clip(w, h, 5)
    # sign_data_hiding is overridden by dep_quant in the TU coder
    cfg = _all_tools_cfg(w, h, qp)
    res = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=8,
                                  mctf=True).encode(frames, qp=qp)
    _check(res, w, h, 5)


def test_all_tools_ctu128_nonmultiple_bitexact():
    """Second variant: CTU 128, non-CTU-multiple 200x120 picture
    (implicit border splits), everything on (VERDICT r2 #9)."""
    w, h = 200, 120
    qp = 32
    frames = _clip(w, h, 3, seed=77)
    cfg = _all_tools_cfg(w, h, qp, ctu_size=128, min_qt_intra=32,
                         min_qt_inter=32, max_bt_intra=64,
                         max_bt_inter=64, cu_qp_delta=True)
    res = gop.RandomAccessEncoder(cfg, gop_size=2, me_range=6,
                                  mctf=True).encode(frames, qp=qp)
    _check(res, w, h, 3)


def test_all_tools_wpp_cuqp_bitexact():
    """Third variant: WPP substreams + the everything-on toolset
    (cu_qp_delta is exercised separately — WPP + QG reset is not
    supported together)."""
    w = h = 128
    qp = 32
    frames = _clip(w, h, 3, seed=55)
    cfg = _all_tools_cfg(w, h, qp, wpp=True)
    res = gop.RandomAccessEncoder(cfg, gop_size=2, me_range=6,
                                  mctf=False).encode(frames, qp=qp)
    _check(res, w, h, 3)
