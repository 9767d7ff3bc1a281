"""BDOF (bi-directional optical flow) — InterPrediction::applyBiOptFlow
parity, exercised through B-slice encodes verified bit-exact by the VTM
oracle decoder (the decoder applies BDOF itself, so any deviation in
our reconstruction breaks the MD5 check)."""

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


def _frames(n, w, h, seed=0):
    """Translating texture so bi prediction with true motion dominates
    (forces bi merge/AMVP winners -> BDOF engages)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 1024, (h + 4 * n, w + 4 * n)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    return [np.ascontiguousarray(base[2 * t:2 * t + h,
                                      t:t + w]).astype(np.int32)
            for t in range(n)]


def test_bdof_refinement_changes_prediction():
    rng = np.random.RandomState(1)
    ref0 = rng.randint(0, 1024, (64, 64)).astype(np.int32)
    ref1 = np.roll(ref0, (1, 1), (0, 1)).astype(np.int32)
    mv0 = (4, 4)
    mv1 = (-4, -4)
    out = inter.bdof_bi_luma(ref0, ref1, 16, 16, 16, 16, mv0, mv1)
    a = inter.mc_luma_intermediate(ref0, 16, 16, 16, 16, mv0)
    b = inter.mc_luma_intermediate(ref1, 16, 16, 16, 16, mv1)
    plain = inter.bi_avg(a, b)
    assert out.shape == (16, 16)
    assert not np.array_equal(out, plain)   # refinement engaged
    # vx/vy clip at +-15, so the correction is bounded by
    # 15 * (|gx0-gx1| + |gy0-gy1|) >> 5 -- sanity-bound it loosely
    assert np.abs(out - plain).max() < 1024


@needs_oracle
@pytest.mark.parametrize("qp", [27, 37])
def test_bdof_b_slices_bitexact(tmp_path, qp):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=qp,
                        bdof=True, temporal_mvp=True, mmvd=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=6)
    frames = _frames(5, 64, 64)
    res = enc.encode(frames, qp=qp)
    _decode_ok(res.bitstream, tmp_path, 5)


@needs_oracle
def test_bdof_420_with_sbt_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        log2_min_cu=3, bdof=True, sbt=True, cclm=True,
                        picture_hash=True, num_reorder_pics=2,
                        max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=2, me_range=4)
    y = _frames(3, 64, 64, seed=7)
    frames = [(f, (f[::2, ::2] // 2 + 256).astype(np.int32),
               (f[1::2, 1::2] // 2 + 200).astype(np.int32))
              for f in y]
    res = enc.encode(frames, qp=32)
    _decode_ok(res.bitstream, tmp_path, 3)
