"""CTU-column-tile sharding of the fused whole-frame search.

Drop-in sharded equivalents of codec.fused_search's two device legs —
the packed per-class intra sweep and the per-8x8 SAD map — running
under `shard_map` over a 1-D device mesh with `ppermute` halo
exchange on the width axis (SURVEY.md §2.6 "CTU-tile sharding with
halo exchange"; the reference encoder has no parallelism to port, so
this layer is TPU-native by construction).

Equality contract: outputs are bit-identical to the single-device
kernels (integer SATD/SAD sums, same candidate enumeration order, and
edge-replication halos that reproduce jnp.pad(mode="edge") at frame
borders), so decisions — and therefore the committed *bitstream* —
match the unsharded encode exactly (tests/test_parallel.py asserts
byte equality).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import intra_batch, rdcost
from .mesh import tile_axis


def _exchange_cols(x, left_n, right_n, axis_name, n_dev):
    """(left_halo [.., left_n], right_halo [.., right_n]) from ring
    ppermute, with frame-border edge replication."""
    idx = jax.lax.axis_index(axis_name)
    lh = jax.lax.ppermute(
        x[:, -left_n:], axis_name,
        [(i, (i + 1) % n_dev) for i in range(n_dev)])
    rh = jax.lax.ppermute(
        x[:, :right_n], axis_name,
        [(i, (i - 1) % n_dev) for i in range(n_dev)])
    lh = jnp.where(idx == 0, jnp.repeat(x[:, :1], left_n, axis=1), lh)
    rh = jnp.where(idx == n_dev - 1,
                   jnp.repeat(x[:, -1:], right_n, axis=1), rh)
    return lh, rh


def _satd_nd(a, b, w, h):
    if w >= 8 and h >= 8:
        return rdcost.satd(a, b)
    return rdcost.satd4(a, b)


def sharded_intra_leaf(plane: np.ndarray, classes, mesh: Mesh):
    """Sharded equivalent of fused_search._intra_leaf_device.

    plane: [H, W] int32, W % (n_dev * max_class_w) == 0 (CTU-aligned
    tiles). Returns the same packed (idx_vector, cost_vector) — per
    class the blocks are re-gathered in frame raster order.
    """
    H, W = plane.shape
    n_dev = mesh.shape[tile_axis]
    max_w = max(w for (w, _) in classes)
    assert W % (n_dev * max_w) == 0, (W, n_dev, max_w)
    w_local = W // n_dev

    def kernel(tile):                       # [H, w_local]
        # halo: 1 left column (left refs of the first block) and
        # max_w right columns (top refs extend 2w past the origin,
        # w past the tile edge for the last block)
        lh, rh = _exchange_cols(tile, 1, max_w, tile_axis, n_dev)
        ext = jnp.concatenate([lh, tile, rh], axis=1)
        # vertical edge padding is local (full H on every tile)
        pad = jnp.pad(ext, ((1, 2 * max(h for (_, h) in classes)),
                            (0, max_w)), mode="edge")
        idx_parts, cost_parts = [], []
        for (w, h) in classes:
            nby, nbx = H // h, w_local // w
            by = (jnp.arange(nby) * h)[:, None, None]
            bx = (1 + jnp.arange(nbx) * w)[None, :, None]
            rt = jnp.arange(2 * w + 1)
            rl = jnp.arange(2 * h + 1)
            tops = pad[by, bx - 1 + rt[None, None, :]] \
                .reshape(-1, 2 * w + 1)
            lefts = pad[by + rl[None, None, :], bx - 1] \
                .reshape(-1, 2 * h + 1)
            blocks = (tile.reshape(nby, h, nbx, w)
                      .swapaxes(1, 2).reshape(-1, h, w))
            preds = intra_batch.predict_all_modes(tops, lefts, w, h)
            c = _satd_nd(preds, blocks[None], w, h)
            idx_parts.append(jnp.argmin(c, axis=0).astype(jnp.int32)
                             .reshape(nby, nbx))
            cost_parts.append(jnp.min(c, axis=0).astype(jnp.float32)
                              .reshape(nby, nbx))
        return tuple(idx_parts) + tuple(cost_parts)

    nc = len(classes)
    fn = shard_map(kernel, mesh=mesh, in_specs=P(None, tile_axis),
                   out_specs=tuple(P(None, tile_axis)
                                   for _ in range(2 * nc)))
    sh = jax.device_put(jnp.asarray(plane),
                        NamedSharding(mesh, P(None, tile_axis)))
    outs = jax.jit(fn)(sh)
    idx = jnp.concatenate([o.reshape(-1) for o in outs[:nc]])
    cost = jnp.concatenate([o.reshape(-1) for o in outs[nc:]])
    return idx, cost


def sharded_sad8_map(org: np.ndarray, ref: np.ndarray, sr: int,
                     mesh: Mesh):
    """Sharded equivalent of fused_search._sad8_map: [K, H//8, W//8]
    int32 SADs of every 8x8 block at every displacement in [-sr,sr]^2
    (same row-major dy-then-dx order)."""
    H, W = org.shape
    n_dev = mesh.shape[tile_axis]
    assert W % (n_dev * 8) == 0
    w_local = W // n_dev

    def kernel(o_tile, r_tile):
        lh, rh = _exchange_cols(r_tile, sr, sr, tile_axis, n_dev)
        r_ext = jnp.concatenate([lh, r_tile, rh], axis=1)
        r_pad = jnp.pad(r_ext, ((sr, sr), (0, 0)), mode="edge")
        offs = jnp.arange(-sr, sr + 1)
        dyx = jnp.stack(jnp.meshgrid(offs, offs, indexing="ij"),
                        -1).reshape(-1, 2)

        def sad_of(off):
            win = jax.lax.dynamic_slice(
                r_pad, (sr + off[0], sr + off[1]), (H, w_local))
            d = jnp.abs(o_tile.astype(jnp.int32)
                        - win.astype(jnp.int32))
            return d.reshape(H // 8, 8, w_local // 8, 8).sum(
                axis=(1, 3))

        return jax.lax.map(sad_of, dyx)

    fn = shard_map(kernel, mesh=mesh,
                   in_specs=(P(None, tile_axis), P(None, tile_axis)),
                   out_specs=P(None, None, tile_axis))
    o = jax.device_put(jnp.asarray(org),
                       NamedSharding(mesh, P(None, tile_axis)))
    r = jax.device_put(jnp.asarray(ref),
                       NamedSharding(mesh, P(None, tile_axis)))
    return jax.jit(fn)(o, r)
