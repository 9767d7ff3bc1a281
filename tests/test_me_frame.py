"""Whole-frame batched inter search (ops/me_frame) unit tests."""

import numpy as np
import pytest

from fastintercu_vvc_tpu.ops import me_frame, inter


def test_class_grid_half_stride_geometry():
    # TT middle children sit at odd multiples of half their size;
    # the grid must cover them (and 8-size classes stay 8-aligned)
    ys, xs = me_frame.class_grid(128, 256, 32, 16)
    assert ys[1] - ys[0] == 8 and xs[1] - xs[0] == 16
    assert ys[-1] == 128 - 16 and xs[-1] == 256 - 32
    ys8, xs8 = me_frame.class_grid(128, 256, 8, 8)
    assert ys8[1] - ys8[0] == 8 and xs8[1] - xs8[0] == 8


def test_mc_frac_batch_matches_scalar_mc():
    """The batched separable MC equals the scalar generic path of
    inter.mc_luma for both-frac MVs (the normative two-pass path)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(5)
    ref = rng.randint(0, 1024, (64, 96)).astype(np.int32)
    pads = jnp.asarray(np.pad(ref, me_frame.PAD, mode="edge"))[None]
    cases = [(8, 8, 16, 24, (7, 5)), (16, 8, 24, 8, (-13, 9)),
             (8, 16, 40, 32, (33, -21))]
    py = jnp.asarray([me_frame.PAD + y for (_, _, _, y, _) in cases])
    px = jnp.asarray([me_frame.PAD + x for (_, _, x, _, _) in cases])
    for i, (w, h, x, y, mv) in enumerate(cases):
        out = me_frame.mc_frac_batch(
            pads, jnp.zeros((1,), jnp.int32),
            py[i:i + 1], px[i:i + 1],
            jnp.asarray([mv[0]]), jnp.asarray([mv[1]]), h, w)
        scalar = inter.mc_luma(ref, x, y, w, h, mv)
        fx, fy = mv[0] & 15, mv[1] & 15
        got = np.asarray(out[0])
        if fx and fy:
            np.testing.assert_array_equal(got, scalar)
        else:
            # single-pass spec rounding differs by <= 1 LSB from the
            # generic two-pass path (documented search-only tolerance)
            assert np.abs(got.astype(int) - scalar).max() <= 1


def test_inter_frame_search_finds_global_shift():
    """A purely translated reference must yield the true displacement
    for every class and near-zero SATD cost."""
    rng = np.random.RandomState(11)
    H, W = 128, 128
    base = rng.randint(200, 800, (H + 32, W + 32)).astype(np.int32)
    dy, dx = 3, -5
    org = base[16:16 + H, 16:16 + W]
    ref = base[16 + dy:16 + dy + H, 16 + dx:16 + dx + W]
    out = me_frame.inter_frame_search(org, [ref], [], [], [],
                                      [(16, 16), (32, 32)], qp=32,
                                      sr=8)
    for c in ((16, 16), (32, 32)):
        r = out[c]
        # interior blocks (away from the replicated borders)
        mvx = r["mv0x"][1:-1, 1:-1] / 16.0
        mvy = r["mv0y"][1:-1, 1:-1] / 16.0
        assert np.median(mvx) == -dx and np.median(mvy) == -dy, c


def test_collocated_candidate_extends_range():
    """Motion beyond the search range is recovered via the collocated
    candidate field (TMVP analog)."""
    rng = np.random.RandomState(7)
    H, W = 64, 128
    base = rng.randint(100, 900, (H + 128, W + 128)).astype(np.int32)
    shift = 44                     # beyond sr=8 and the coarse 4*sr=32
    org = base[64:64 + H, 64:64 + W]
    ref = base[64:64 + H, 64 - shift:64 - shift + W]
    colf = np.zeros((H // 8, W // 8, 2), np.int32)
    colf[..., 0] = shift * 16      # internal units, x component
    colv = np.ones((H // 8, W // 8), bool)
    out = me_frame.inter_frame_search(org, [ref], [], [(colf, colv)],
                                      [], [(16, 16)], qp=32, sr=8)
    r = out[(16, 16)]
    # only interior columns where the true match is inside the
    # reference plane (the replicated border breaks the correlation)
    _, xs = me_frame.class_grid(H, W, 16, 16)
    valid = xs + 16 + shift <= W
    hits = (r["mv0x"][:, valid] == shift * 16).mean()
    assert hits > 0.9, hits
    assert r["mlike"][:, valid].all()
