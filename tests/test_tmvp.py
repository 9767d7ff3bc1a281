"""TMVP (temporal motion vector prediction): colocated-MV derivation,
motion-field compression rounding, POC scaling, merge/AMVP temporal
candidates, and the collocated slice-header syntax — oracle bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.ops import inter

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")


def test_mv_compression_round():
    # 18-bit float compression: exact for small magnitudes, quantized
    # for large (convertMvFixedToFloat/Fixed parity spot checks)
    for v in (0, 1, -1, 31, -31, 32, -32, 63, 64, 100, -100, 2047):
        r = inter.round_mv_comp(v)
        if abs(v) <= 32:
            assert r == v, (v, r)
    assert inter.round_mv_comp(65) in (64, 66)   # quantized above 6 bits


def test_dist_scale_factor():
    # equal distances short-circuit to the no-scale marker 4096
    assert inter.dist_scale_factor(4, 3, 3, 2) == 4096
    # computed scales are in 256 = x1 units: double distance -> 512
    assert inter.dist_scale_factor(4, 2, 3, 2) == 512
    # half distance -> 128
    assert inter.dist_scale_factor(4, 3, 2, 0) == 128
    # opposite direction (future ref) -> negative
    assert inter.dist_scale_factor(2, 3, 1, 0) < 0


def test_scale_mv_rounding():
    assert inter.scale_mv((16, -16), 256) == (16, -16)   # x1
    assert inter.scale_mv((16, -16), 128) == (8, -8)     # x0.5
    assert inter.scale_mv((3, -3), 128) == (1, -1)  # sym round to +-1.5


def mk420(w, h, n, seed=4):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        y = np.clip(512 + 220 * np.sin((xx - 3 * t) / 13.0)
                    * np.cos((yy - 1.2 * t) / 17.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0), 0,
                    1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def decode_y(bs, w, h, n):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per
        return [out[t * per:t * per + w * h].reshape(h, w).astype(int)
                for t in range(n)]


needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


@needs_oracle
def test_tmvp_ippp_ldc_bitexact():
    w = h = 128
    qp = 32
    frames = mk420(w, h, 4)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, temporal_mvp=True)
    res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon)


@needs_oracle
def test_tmvp_ra_bslices_bitexact():
    """non-LDC path: eColRefPicList follows collocated_from_l0."""
    w = h = 128
    qp = 32
    frames = mk420(w, h, 5)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, temporal_mvp=True,
                        num_reorder_pics=2, max_dec_pic_buffering=5)
    res = gop.RandomAccessEncoder(cfg, gop_size=4, me_range=4
                                  ).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon)


@needs_oracle
def test_tmvp_candidates_actually_used():
    w = h = 128
    frames = mk420(w, h, 3)
    hits = [0]
    orig = inter.tmvp_merge_cand

    def spy(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            hits[0] += 1
        return r
    inter.tmvp_merge_cand = spy
    try:
        cfg = hls.SeqConfig(width=w, height=h,
                            chroma_format=hls.CHROMA_420, ctu_size=64,
                            min_qt_intra=16, min_qt_inter=16,
                            log2_min_cu=3, qp=32, temporal_mvp=True)
        res = gop.SequenceEncoder(cfg, me_range=4).encode(frames, qp=32)
    finally:
        inter.tmvp_merge_cand = orig
    assert hits[0] > 0
    dec = decode_y(res.bitstream, w, h, 3)
    for t in range(3):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon)
