"""CTU-tile sharding of the batched search with halo exchange.

The frame is sharded across devices as vertical CTU-column tiles; the
intra-mode search for each tile needs reference samples from its LEFT
neighbor tile (left column refs) and, for above-right references, from
its RIGHT neighbor — exchanged with `jax.lax.ppermute` inside a
`shard_map` (the TPU-native replacement for the reference's
nonexistent encoder parallelism; SURVEY.md §2.6 "CTU-tile sharding
across devices with halo exchange" is the BASELINE north star).

The search phase uses original-picture references (codec.batch_search
design), so the halo is a pure *input* halo — no iterative dependency —
making the whole frame search a single collective-augmented pmap step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import intra_batch, rdcost
from .mesh import tile_axis


def halo_exchange_width(x: jnp.ndarray, halo: int, axis_name: str):
    """Inside shard_map: return (left_halo, right_halo) strips of the
    neighbors' edge columns. x: [..., W_local]; ring topology with edge
    replication semantics handled by the caller (first/last tiles get
    wrapped data; the search refs clamp at frame borders anyway)."""
    n = jax.lax.psum(1, axis_name)
    right_edge = x[..., -halo:]
    left_edge = x[..., :halo]
    # send my right edge to my right neighbor -> arrives as his left halo
    left_halo = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)])
    right_halo = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)])
    return left_halo, right_halo


def _tile_refs(tile_padded, s, n_by, n_bx, halo):
    """Build per-block top/left ref arrays from a left+right haloed tile.

    tile_padded: [H + 1, halo + W_local + 2*s] — one replicated row on
    top (edge padding applied by caller) and halo columns on the left.
    Returns tops [N, 2s+1], lefts [N, 2s+1] for the n_by*n_bx local
    blocks in raster order.
    """
    tops = []
    lefts = []
    for by in range(n_by):
        for bx in range(n_bx):
            y = by * s
            x = halo + bx * s
            tops.append(jax.lax.dynamic_slice(
                tile_padded, (y, x - 1), (1, 2 * s + 1))[0])
            lefts.append(jax.lax.dynamic_slice(
                tile_padded, (y, x - 1), (2 * s + 1, 1))[:, 0])
    return jnp.stack(tops), jnp.stack(lefts)


def sharded_level_cost(frame: jnp.ndarray, s: int, mesh: Mesh):
    """Distributed all-mode intra search for one QT level.

    frame: [H, W] int32 (replicated host array; will be sharded on W).
    Returns (best_mode [n_by, n_bx_total], best_cost) gathered on host.

    Requires W % (num_tiles * s) == 0.
    """
    H, W = frame.shape
    n_dev = mesh.shape[tile_axis]
    assert W % (n_dev * s) == 0, (W, n_dev, s)
    w_local = W // n_dev
    # single-hop ppermute halo: each tile must be at least one halo wide
    # (2 CTU columns at the largest level); narrower tiles would need a
    # multi-hop exchange
    assert w_local >= 2 * s, (w_local, s)
    n_by = H // s
    n_bx_local = w_local // s
    halo = 2 * s

    def kernel(tile):            # tile: [H, w_local]
        lh, rh = halo_exchange_width(tile, halo, tile_axis)
        idx = jax.lax.axis_index(tile_axis)
        # frame borders: first tile's left halo / last tile's right halo
        # replicate the own edge column (clamp semantics of the search
        # reference construction)
        lh = jnp.where(idx == 0,
                       jnp.repeat(tile[:, :1], halo, axis=1), lh)
        rh = jnp.where(idx == n_dev - 1,
                       jnp.repeat(tile[:, -1:], halo, axis=1), rh)
        padded = jnp.concatenate([lh, tile, rh], axis=1)
        # replicate the top row (clamp) and append bottom padding
        padded = jnp.concatenate(
            [padded[:1], padded,
             jnp.repeat(padded[-1:], 2 * s, axis=0)], axis=0)
        tops, lefts = _tile_refs(padded, s, n_by, n_bx_local, halo)
        blocks = (tile.reshape(n_by, s, n_bx_local, s)
                  .swapaxes(1, 2).reshape(-1, s, s))
        preds = intra_batch.predict_all_modes(tops, lefts, s, s)
        costs = rdcost.satd(preds, blocks[None]) if s >= 8 else \
            rdcost.satd4(preds, blocks[None])
        best_mode = jnp.argmin(costs, axis=0).astype(jnp.int32)
        best_cost = jnp.min(costs, axis=0).astype(jnp.int32)
        return (best_mode.reshape(n_by, n_bx_local),
                best_cost.reshape(n_by, n_bx_local))

    fn = shard_map(kernel, mesh=mesh,
                   in_specs=P(None, tile_axis),
                   out_specs=(P(None, tile_axis), P(None, tile_axis)))
    frame_sharded = jax.device_put(
        frame, NamedSharding(mesh, P(None, tile_axis)))
    mode, cost = jax.jit(fn)(frame_sharded)
    return mode, cost
