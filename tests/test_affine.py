"""Affine motion (4/6-param) — PU::getAffineMergeCand /
fillAffineMvpCand / xPredAffineBlk / PROF parity: subblock MV grids,
merge inheritance (incl. the top-CTU-boundary line-buffer rule),
constructed candidates, CPMV AMVP with per-corner MVD signalling,
gradient ME, and the 6-tap 4x4 MC filter — all verified bit-exact by
the VTM oracle."""

import os
import subprocess

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, gop, hls
from fastintercu_vvc_tpu.ops import affine, inter

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


def _rot_frames(n, w, h, seed=0, ang_step=0.025, zoom_step=0.012):
    """Rotating + zooming content so affine modes win RD."""
    rng = np.random.RandomState(seed)
    big = rng.randint(0, 1024, (h * 2, w * 2)).astype(np.float64)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, 2, 1)) / 4
    out = []
    for t in range(n):
        ang = ang_step * t
        sc = 1.0 + zoom_step * t
        ys, xs = np.mgrid[0:h, 0:w]
        yr, xr = ys - h / 2, xs - w / 2
        sx = np.clip(w + sc * (np.cos(ang) * xr - np.sin(ang) * yr),
                     0, 2 * w - 1).astype(int)
        sy = np.clip(h + sc * (np.sin(ang) * xr + np.cos(ang) * yr),
                     0, 2 * h - 1).astype(int)
        out.append(big[sy, sx].astype(np.int32))
    return out


# ---------------------------------------------------------------------
# unit tests (no oracle)

def test_storage_grid_4param_rotation():
    """4-param grid: dVer derived as (-dHorY, dHorX)."""
    cpmv = ((64, 32), (96, 48), (0, 0))     # internal 1/16
    g = affine.storage_mv_grid(cpmv, 32, 32, 0, 1)
    assert g.shape == (8, 8, 2)
    # LT subblock center (2,2): exact formula check
    a, b, c, d = affine.model_deltas(cpmv, 32, 32, 0)
    assert (c, d) == (-b, a)
    hx = (cpmv[0][0] << 7) + a * 2 + c * 2
    hy = (cpmv[0][1] << 7) + b * 2 + d * 2
    ex, ey = affine.round_affine(hx, hy, 7)
    assert (g[0, 0, 0], g[0, 0, 1]) == (ex, ey)


def test_storage_grid_translation_constant():
    cpmv = ((-48, 80), (-48, 80), (-48, 80))
    g = affine.storage_mv_grid(cpmv, 64, 16, 1, 3)
    assert (g[..., 0] == -48).all() and (g[..., 1] == 80).all()


def test_inherited_cpmv_identity():
    """Inheriting at the neighbour's own corners reproduces its
    CPMVs."""
    cp = ((64, 0), (128, 16), (32, 80))
    out = affine.inherited_cpmv(64, 64, 32, 16, cp, 1,
                                64, 64, 32, 16, 1, 128)
    assert out[0] == cp[0] and out[1] == cp[1] and out[2] == cp[2]


def test_mc_luma_matches_translation():
    """Degenerate CPMVs == translational MC with the 4x4 6-tap
    filter."""
    rng = np.random.RandomState(1)
    ref = rng.randint(0, 1024, (64, 64)).astype(np.int32)
    mv = (37, -21)
    cp = (mv, mv, mv)
    p, g = affine.mc_luma(ref, 16, 16, 8, 8, cp, 0, 1, False, 10,
                          64, 64, 64, True)
    # PROF disabled (all CPMVs equal); compare against a direct 6-tap
    fx, fy = mv[0] & 15, mv[1] & 15
    ix, iy = 16 + (mv[0] >> 4), 16 + (mv[1] >> 4)
    win = inter._gather_clamped(ref, ix - 3, iy - 3, 8 + 7, 8 + 7)
    fxc = affine.LUMA_FILTER_4x4[fx]
    fyc = affine.LUMA_FILTER_4x4[fy]
    tmp = np.zeros((15, 8), np.int64)
    for r in range(15):
        for c in range(8):
            acc = sum(int(fxc[k]) * int(win[r, c + k]) for k in range(8))
            tmp[r, c] = (acc + (-8192 << 2)) >> 2
    exp = np.zeros((8, 8), np.int64)
    for r in range(8):
        for c in range(8):
            acc = sum(int(fyc[k]) * int(tmp[r + k, c]) for k in range(8))
            exp[r, c] = min(max((acc + (1 << 9) + (8192 << 6)) >> 10, 0),
                            1023)
    assert (p == exp).all()


def test_affine_mvd_roundtrip():
    """MVD differential rule inverts exactly (DecCu.cpp:979)."""
    cp = ((68, -32), (96, -20), (40, 12))
    preds = [((64, -28), (80, -24), (32, 8)),
             ((0, 0), (0, 0), (0, 0))]
    mvp_idx, mvds = encoder.FrameEncoder._affine_mvds(cp, preds, 1)
    pr = preds[mvp_idx]
    lt = (pr[0][0] + (mvds[0][0] << 2), pr[0][1] + (mvds[0][1] << 2))
    rt = (pr[1][0] + ((mvds[1][0] + mvds[0][0]) << 2),
          pr[1][1] + ((mvds[1][1] + mvds[0][1]) << 2))
    lb = (pr[2][0] + ((mvds[2][0] + mvds[0][0]) << 2),
          pr[2][1] + ((mvds[2][1] + mvds[0][1]) << 2))
    assert (lt, rt, lb) == cp


# ---------------------------------------------------------------------
# oracle bit-exactness

@needs_oracle
@pytest.mark.parametrize("qp", [27, 35])
def test_affine_ipb_bitexact(tmp_path, qp):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=qp,
                        temporal_mvp=True, sbtmvp=True,
                        affine=True, affine_type=True, prof=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    res = enc.encode(_rot_frames(5, 64, 64), qp=qp)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_affine_commits_cus(tmp_path):
    """The affine paths must actually be chosen on affine-friendly
    content (guards against the trials silently never winning)."""
    count = {"merge": 0, "amvp": 0}
    orig = encoder.FrameEncoder._commit_affine

    def patched(self, x, y, w, h, qt_depth, trial):
        k = "merge" if trial["affine"]["merge_idx"] is not None \
            else "amvp"
        count[k] += 1
        return orig(self, x, y, w, h, qt_depth, trial)

    encoder.FrameEncoder._commit_affine = patched
    try:
        cfg = hls.SeqConfig(width=64, height=64,
                            chroma_format=hls.CHROMA_400, ctu_size=64,
                            min_qt_intra=16, min_qt_inter=16, qp=30,
                            temporal_mvp=True, sbtmvp=True,
                            affine=True, affine_type=True, prof=True,
                            picture_hash=True, num_reorder_pics=2,
                            max_dec_pic_buffering=6)
        enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
        res = enc.encode(_rot_frames(5, 64, 64, seed=0, ang_step=0.03,
                                     zoom_step=0.015), qp=30)
    finally:
        encoder.FrameEncoder._commit_affine = orig
    assert count["amvp"] > 0, count
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_affine_420_deblock_cross_ctu_bitexact(tmp_path):
    """4:2:0 + deblocking, two CTU rows: affine chroma MC, subblock
    deblock edges, and the top-CTU-boundary (line buffer) CPMV
    inheritance path."""
    ys = _rot_frames(5, 64, 128, seed=3)
    fs = [(f, (f[::2, ::2] // 2 + 256).astype(np.int32),
           (f[::2, 1::2] // 2 + 220).astype(np.int32)) for f in ys]
    cfg = hls.SeqConfig(width=64, height=128, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=30,
                        log2_min_cu=3, temporal_mvp=True, sbtmvp=True,
                        affine=True, affine_type=True, prof=True,
                        deblocking=True, picture_hash=True,
                        num_reorder_pics=2, max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    res = enc.encode(fs, qp=30)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_affine_with_inter_tools_bitexact(tmp_path):
    """Affine alongside BDOF/DMVR/MMVD/BCW (mode interactions: the
    affine flag context, subblock merge list sharing, BCW with affine
    bi)."""
    cfg = hls.SeqConfig(width=128, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        temporal_mvp=True, sbtmvp=True,
                        affine=True, affine_type=True, prof=True,
                        bdof=True, dmvr=True, mmvd=True, bcw=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    res = enc.encode(_rot_frames(5, 128, 64, seed=7), qp=32)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_affine_4param_only_bitexact(tmp_path):
    """sps_affine_type_flag == 0: constructed candidates restricted to
    2-corner models, no affine_type bin."""
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=30,
                        temporal_mvp=True, sbtmvp=True,
                        affine=True, affine_type=False, prof=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    res = enc.encode(_rot_frames(5, 64, 64, seed=11), qp=30)
    _decode_ok(res.bitstream, tmp_path, 5)
