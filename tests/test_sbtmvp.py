"""SbTMVP (subblock temporal MVP) — PU::getInterMergeSubPuMvpCand
parity: subblock merge flag syntax, per-8x8 collocated motion fetch
with A1 temporal-vector shift, subblock MC, the 8-grid internal
deblocking edges, all verified bit-exact by the VTM oracle."""

import os
import subprocess

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.ops import inter

ORACLE = os.path.join(os.path.dirname(__file__), "..", "oracle",
                      "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def _decode_ok(bs, tmp_path, n_frames):
    p = tmp_path / "s.bin"
    p.write_bytes(bs)
    r = subprocess.run([ORACLE, "-b", str(p), "-o",
                        str(tmp_path / "r.yuv")],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr + r.stdout
    assert r.stdout.count("(OK)") == n_frames, r.stdout


def _frames(n, w, h, seed=0, vel=(2, 1)):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 1024, (h + 8 * n, w + 8 * n)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, 2, 0)) // 4
    return [np.ascontiguousarray(
        base[vel[1] * t:vel[1] * t + h, vel[0] * t:vel[0] * t + w])
        .astype(np.int32) for t in range(n)]


def test_sbtmvp_derivation_shapes():
    shp = (16, 16)          # 64x64 picture in 4x4 units
    col = inter.ColMotion(
        4, np.full(shp, 1, np.int8),
        np.tile(np.arange(16, dtype=np.int32)[None, :, None] * 16,
                (16, 1, 2)),
        np.zeros(shp, np.int32),        # ref poc 0
        np.zeros(shp + (2,), np.int32), np.full(shp, -1, np.int32))
    tmvp = {"col": col, "cur_poc": 2, "ref_poc_l0": 0,
            "ref_poc_l1": None, "check_ldc": True, "col_from_l0": True,
            "pic_w": 64, "pic_h": 64, "ctu_size": 64}
    out = inter.sbtmvp_candidate(tmvp, None, -1, -1, 16, 16, 32, 32,
                                 False)
    assert out is not None
    ctr, grid, sub_w, sub_h = out
    assert (sub_w, sub_h) == (8, 8)
    assert len(grid) == 4 and len(grid[0]) == 4
    assert ctr.inter_dir == 1
    # different subblocks pick up different collocated MVs
    mvs = {g.mv0 for row in grid for g in row}
    assert len(mvs) > 1


@needs_oracle
@pytest.mark.parametrize("qp", [27, 37])
def test_sbtmvp_ipb_bitexact(tmp_path, qp):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=qp,
                        temporal_mvp=True, sbtmvp=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    frames = _frames(5, 64, 64)
    res = enc.encode(frames, qp=qp)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_sbtmvp_420_with_deblock_bitexact(tmp_path):
    """Deblocking on: internal 8-grid subblock edges engage."""
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=30,
                        log2_min_cu=3, temporal_mvp=True, sbtmvp=True,
                        deblocking=True, mmvd=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    y = _frames(5, 64, 64, seed=5, vel=(3, 2))
    frames = [(f, (f[::2, ::2] // 2 + 256).astype(np.int32),
               (f[::2, 1::2] // 2 + 220).astype(np.int32))
              for f in y]
    res = enc.encode(frames, qp=30)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_sbtmvp_with_dmvr_bdof_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        temporal_mvp=True, sbtmvp=True, dmvr=True,
                        bdof=True, picture_hash=True,
                        num_reorder_pics=2, max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    frames = _frames(5, 64, 64, seed=8, vel=(1, 2))
    res = enc.encode(frames, qp=32)
    _decode_ok(res.bitstream, tmp_path, 5)
