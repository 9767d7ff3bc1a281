"""Batched (TPU-first) integer motion estimation.

The reference's ME hot loop is a per-PU TZ search with SIMD SAD
kernels (InterSearch.cpp:3299 xMotionEstimation + RdCostX86.h). Here
the integer search runs for ALL blocks of the frame at once on
device: one jitted pass evaluates every candidate offset as a shifted
whole-frame absolute difference reduced per block — elementwise +
reductions that XLA fuses and tiles, with no per-block Python.

The sequential encoder consumes the per-block best integer MVs as
search hints and only refines locally (sub-pel), so its Python ME
loop collapses from O((2R+1)^2) SADs per CU to a handful.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2, 3))
def _full_search(org: jnp.ndarray, ref: jnp.ndarray, bs: int, sr: int):
    """-> (best_dy [nby,nbx], best_dx, best_sad) integer-pel full
    search over [-sr, sr]^2 for all bs x bs blocks."""
    H, W = org.shape
    nby, nbx = H // bs, W // bs
    pad = jnp.pad(ref, sr, mode="edge")
    offs = jnp.arange(-sr, sr + 1)
    dyx = jnp.stack(jnp.meshgrid(offs, offs, indexing="ij"),
                    -1).reshape(-1, 2)                      # [K, 2]

    def sad_of(off):
        dy, dx = off[0], off[1]
        win = jax.lax.dynamic_slice(pad, (sr + dy, sr + dx), (H, W))
        d = jnp.abs(org.astype(jnp.int32) - win.astype(jnp.int32))
        return (d.reshape(nby, bs, nbx, bs)
                .sum(axis=(1, 3)))                          # [nby, nbx]

    sads = jax.lax.map(sad_of, dyx)                         # [K, nby, nbx]
    best = jnp.argmin(sads, axis=0)
    best_sad = jnp.min(sads, axis=0)
    return dyx[best][..., 0], dyx[best][..., 1], best_sad


class MeHints:
    """Per-16x16-block best integer MVs against one reference plane."""

    BS = 16

    def __init__(self, org: np.ndarray, ref: np.ndarray,
                 search_range: int):
        H, W = org.shape
        bs = self.BS
        if H % bs or W % bs:
            # arbitrary picture sizes: edge-pad to the block grid (the
            # padded area only dilutes border-block SADs — hints stay
            # hints, the per-CU refinement recovers)
            ph, pw = -H % bs, -W % bs
            org = np.pad(org, ((0, ph), (0, pw)), mode="edge")
            ref = np.pad(ref, ((0, ph), (0, pw)), mode="edge")
        dy, dx, sad = _full_search(jnp.asarray(org), jnp.asarray(ref),
                                   bs, int(search_range))
        self.dy = np.array(dy)
        self.dx = np.array(dx)
        self.sad = np.array(sad)

    def candidates(self, x: int, y: int, w: int, h: int):
        """Distinct integer-MV hints of the blocks covering a CU."""
        bs = self.BS
        out = []
        for by in range(y // bs, min((y + h - 1) // bs + 1,
                                     self.dy.shape[0])):
            for bx in range(x // bs, min((x + w - 1) // bs + 1,
                                         self.dy.shape[1])):
                out.append((int(self.dx[by, bx]), int(self.dy[by, bx])))
        # dedup preserving order
        seen, uniq = set(), []
        for c in out:
            if c not in seen:
                seen.add(c)
                uniq.append(c)
        return uniq
