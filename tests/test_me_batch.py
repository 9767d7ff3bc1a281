"""Batched whole-frame integer motion estimation (ops/me_batch)."""

import numpy as np
import pytest

from fastintercu_vvc_tpu.ops import me_batch


def test_full_search_matches_brute_force():
    rng = np.random.RandomState(0)
    org = rng.randint(0, 1024, (32, 48)).astype(np.int32)
    ref = np.roll(org, (2, -3), axis=(0, 1))
    sr = 6
    h = me_batch.MeHints(org, ref, sr)
    pad = np.pad(ref, sr, mode="edge")
    for by in range(2):
        for bx in range(3):
            blk = org[by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16]
            best = None
            for dy in range(-sr, sr + 1):
                for dx in range(-sr, sr + 1):
                    win = pad[sr + by * 16 + dy:sr + by * 16 + 16 + dy,
                              sr + bx * 16 + dx:sr + bx * 16 + 16 + dx]
                    s = int(np.abs(blk - win).sum())
                    if best is None or s < best[0]:
                        best = (s, dx, dy)
            assert (int(h.dx[by, bx]), int(h.dy[by, bx])) == \
                (best[1], best[2]), (by, bx)
            assert int(h.sad[by, bx]) == best[0]


def test_candidates_cover_cu():
    org = np.zeros((64, 64), np.int32)
    ref = np.zeros((64, 64), np.int32)
    h = me_batch.MeHints(org, ref, 4)
    h.dx[:] = np.arange(4 * 4).reshape(4, 4) % 7 - 3
    h.dy[:] = 0
    c = h.candidates(0, 0, 32, 32)       # covers blocks (0..1, 0..1)
    assert set(c) == {(int(h.dx[by, bx]), 0)
                      for by in range(2) for bx in range(2)}


def test_encoder_same_stream_with_and_without_hints():
    """Hinted ME must stay oracle-consistent; on content whose motion
    is within range both modes find equally good predictions."""
    import jax
    from fastintercu_vvc_tpu.codec import hls, gop
    rng = np.random.RandomState(1)
    w = h = 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(3):
        y = np.clip(512 + 220 * np.sin((xx - 3 * t) / 13.0)
                    + rng.randint(-6, 6, (h, w)), 0, 1023).astype(np.int32)
        frames.append(y)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=32)
    outs = {}
    for bme in (False, True):
        se = gop.SequenceEncoder(cfg, me_range=8, batched_me=bme)
        res = se.encode(frames, qp=32)
        mse = np.mean([np.mean((r.recon - f).astype(float) ** 2)
                       for r, f in zip(res.recons, frames)])
        outs[bme] = (sum(res.frame_bits), mse)
    # hinted search must be at least as good RD-wise (within 10%)
    assert outs[True][0] <= outs[False][0] * 1.10
    assert outs[True][1] <= outs[False][1] * 1.10
