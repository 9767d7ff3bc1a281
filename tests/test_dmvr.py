"""DMVR (decoder-side MV refinement) — InterPrediction::xProcessDMVR
parity.  The oracle decoder re-runs the same refinement; any deviation
in search order, sub-pel surface, padded final MC or the refined
temporal motion field breaks bit-exactness."""

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


def _frames(n, w, h, seed=0, vel=(3, 1)):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 1024, (h + 8 * n, w + 8 * n)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 2, 1)
            + np.roll(base, 1, 1)) // 4
    return [np.ascontiguousarray(
        base[vel[1] * t:vel[1] * t + h, vel[0] * t:vel[0] * t + w])
        .astype(np.int32) for t in range(n)]


def test_dmvr_refine_finds_motion():
    """Mirror-shifted references: the +-2 search should recover the
    true displacement for at least some sub-PUs."""
    rng = np.random.RandomState(3)
    base = rng.randint(0, 1024, (96, 96)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    ref0 = base[2:66, 1:65].copy()          # offset (+1, +2)
    ref1 = base[0:64, 1:65].copy()          # offset (+1, 0)
    cur_unused = base[1:65, 1:65]
    del cur_unused
    pred, deltas, moved = inter.dmvr_refine_luma(
        np.ascontiguousarray(ref0), np.ascontiguousarray(ref1),
        16, 16, 32, 32, (0, 0), (0, 0), 10, 64, 64, 64, False)
    # true delta: applying +d to L0 and -d to L1 aligns them when
    # d = (0, -16) internal (ref0 is shifted +1 row vs ref1 center)
    assert moved.any()
    assert pred.shape == (32, 32)


@needs_oracle
@pytest.mark.parametrize("qp", [27, 37])
def test_dmvr_b_slices_bitexact(tmp_path, qp):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=qp,
                        dmvr=True, temporal_mvp=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    frames = _frames(5, 64, 64)
    res = enc.encode(frames, qp=qp)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_dmvr_plus_bdof_420_bitexact(tmp_path):
    """DMVR and BDOF together: BDOF runs inside DMVR per sub-PU when
    the refinement SAD clears the threshold."""
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        log2_min_cu=3, dmvr=True, bdof=True,
                        temporal_mvp=True, mmvd=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    y = _frames(5, 64, 64, seed=9, vel=(2, 2))
    frames = [(f, (f[::2, ::2] // 2 + 200).astype(np.int32),
               (f[1::2, ::2] // 2 + 300).astype(np.int32))
              for f in y]
    res = enc.encode(frames, qp=32)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_dmvr_large_cu_128_bitexact(tmp_path):
    """128-wide CTU: DMVR sub-PU grid spans multiple 64-sample TU
    tiles."""
    cfg = hls.SeqConfig(width=128, height=128,
                        chroma_format=hls.CHROMA_400, ctu_size=128,
                        min_qt_intra=32, min_qt_inter=32, qp=37,
                        dmvr=True, picture_hash=True,
                        num_reorder_pics=2, max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=2, me_range=4)
    frames = _frames(3, 128, 128, seed=11, vel=(1, 3))
    res = enc.encode(frames, qp=37)
    _decode_ok(res.bitstream, tmp_path, 3)
