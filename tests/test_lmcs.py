"""LMCS (luma mapping with chroma scaling) — Reshape.cpp parity:
PWL LUT construction, forward mapping of inter predictions (CIIP
before the blend, GEO after), mapped-domain intra coding, inverse
mapping before the in-loop filters, VPDU-neighbour chroma residual
scaling, and the LMCS APS / picture-header syntax — verified bit-exact
by the VTM oracle."""

import os
import subprocess

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.ops import lmcs

ORACLE = os.path.join(os.path.dirname(__file__), "..", "oracle",
                      "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def _decode_ok(bs, tmp_path, n_frames):
    p = tmp_path / "s.bin"
    p.write_bytes(bs)
    r = subprocess.run([ORACLE, "-b", str(p), "-o",
                        str(tmp_path / "r.yuv")],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr + r.stdout
    assert r.stdout.count("(OK)") == n_frames, r.stdout


def _frames_400(n, w, h, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.clip(200 + 150 * np.sin((xx + 2 * t) / 6.0)
                    + 100 * np.cos(yy / 17.0)
                    + rng.randint(-20, 20, (h, w)), 0,
                    1023).astype(np.int32) for t in range(n)]


def _frames_420(n, w, h, seed=5):
    rng = np.random.RandomState(seed)
    big = rng.randint(0, 900, (h * 2, w * 2)).astype(np.float64)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)) / 3 + 60
    out = []
    for t in range(n):
        y = np.clip(big[2 * t:2 * t + h, 3 * t:3 * t + w], 0,
                    1023).astype(np.int32)
        u = np.clip(y[::2, ::2] // 2 + 256, 0, 1023).astype(np.int32)
        v = np.clip(800 - y[::2, 1::2] // 2, 0, 1023).astype(np.int32)
        out.append((y, u, v))
    return out


# ---------------------------------------------------------------------
# unit tests

def test_identity_curve_is_identity():
    m = lmcs.LmcsModel([64] * 16, 0, 10)
    xs = np.arange(1024)
    assert (m.fwd_lut == xs).all()
    assert (m.inv_lut == xs).all()
    assert all(int(v) == 1 << lmcs.CSCALE_FP_PREC
               for v in m.chroma_adj_lut)


def test_lut_monotone_and_invertible_on_pivots():
    cw = [32, 48, 64, 96, 127, 96, 64, 48, 64, 64, 64, 64, 64, 64,
          64, 65]
    cw[15] = 1024 - sum(cw[:15])
    m = lmcs.LmcsModel(cw, 0, 10)
    assert (np.diff(m.fwd_lut) >= 0).all()
    assert (np.diff(m.inv_lut) >= 0).all()
    # input pivots map to reshaped pivots exactly
    for i in range(16):
        assert int(m.fwd_lut[int(m.input_pivot[i])]) == \
            int(m.pivot[i])


def test_chroma_scale_roundtrip_zero():
    r = np.zeros((4, 4), np.int32)
    assert (lmcs.scale_fwd(r, 1500, 10) == 0).all()
    assert (lmcs.scale_inv(r, 1500, 10) == 0).all()


def test_derive_curve_legal():
    rng = np.random.RandomState(0)
    org = rng.randint(100, 900, (64, 64)).astype(np.int32)
    m = lmcs.derive_curve(org, 10)
    assert sum(m.bin_cw) == 1024
    assert all(32 <= v <= 127 for v in m.bin_cw)
    mn, dmax, prec, deltas, crs = m.aps_fields()
    assert mn == 0 and dmax == 0 and len(deltas) == 16


# ---------------------------------------------------------------------
# oracle bit-exactness

@needs_oracle
def test_lmcs_allintra_400_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, qp=30, lmcs=True,
                        picture_hash=True)
    enc = gop.SequenceEncoder(cfg, intra_period=1)
    res = enc.encode(_frames_400(2, 64, 64), qp=30)
    _decode_ok(res.bitstream, tmp_path, 2)


@needs_oracle
def test_lmcs_ippp_420_chroma_scaling_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=30,
                        log2_min_cu=3, lmcs=True, temporal_mvp=True,
                        mmvd=True, joint_cbcr=True, cclm=True,
                        picture_hash=True)
    enc = gop.SequenceEncoder(cfg, intra_period=0)
    res = enc.encode(_frames_420(4, 64, 64), qp=30)
    _decode_ok(res.bitstream, tmp_path, 4)


@needs_oracle
def test_lmcs_ra_inter_tools_bitexact(tmp_path):
    """LMCS with the B pyramid and the mapped-prediction interactions:
    CIIP (map before blend), GEO (map after blend), SBT, skip CUs,
    affine, deblocking on the inverse-mapped recon, APS TemporalId."""
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        log2_min_cu=3, lmcs=True, temporal_mvp=True,
                        sbtmvp=True, affine=True, prof=True,
                        bdof=True, dmvr=True, mmvd=True, bcw=True,
                        ciip=True, geo=True, sbt=True,
                        joint_cbcr=True, deblocking=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    ys = _frames_400(5, 64, 64, seed=9)
    fs = [(y, (y[::2, ::2] // 2 + 256).astype(np.int32),
           (y[::2, 1::2] // 2 + 200).astype(np.int32)) for y in ys]
    res = enc.encode(fs, qp=32)
    _decode_ok(res.bitstream, tmp_path, 5)
