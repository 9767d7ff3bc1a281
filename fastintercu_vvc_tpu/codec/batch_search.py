"""Batched (TPU-first) partition + intra-mode search.

The reference encodes with a depth-first recursive RDO
(EncCu::xCompressCU, EncCu.cpp:541) — pointer-chasing, one block at a
time. Here the QTMT tree is evaluated *level by level for the whole
frame at once* (SURVEY.md §7.1 "batch, don't recurse"):

  1. for each QT level s: gather refs for ALL s x s blocks, predict all
     67 intra modes in one jitted call (ops/intra_batch), score with
     batched SATD (ops/rdcost), keep best mode + cost per block;
  2. bottom-up dynamic program chooses split/no-split per node;
  3. a sequential commit pass (codec/encoder with forced decisions)
     writes exact syntax + reconstruction.

The search phase uses original-picture reference samples (standard
encoder approximation — the commit pass reconstructs exactly), which is
what makes the whole search data-parallel: no wavefront dependency.

The MLT-CNN pruning hook (`split_hints`) slots in exactly where the
reference's setNewModeList does (EncModeCtrl.cpp:110-149): a per-CTU
predicted class {0: no-split, 1: QT} forces the DP decision at the CTU
root — but evaluated for the whole frame in ONE batched inference
instead of a per-CTU CUDA round trip (EncCu.cpp:894-905).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra_batch, rdcost
from . import hls, partition


@dataclasses.dataclass
class SearchDecisions:
    """Per-CTU partition + mode decisions, consumable by the commit
    pass. split[(x, y, s)] -> bool (QT split); mode[(x, y, s)] -> int
    (intra mode) or ("inter", (mvx, mvy)).

    level: per-level square-block grids (size -> dict with at least
    "imode"; inter searches add "inter"/"mvx"/"mvy").  The commit pass
    walks implicit picture-border splits (BT children, non-square
    geometry) that the QT-level search never keyed; lookup_mode
    resolves ANY leaf geometry against the covering search grid."""
    split: dict
    mode: dict
    level: dict = dataclasses.field(default_factory=dict)

    def lookup_mode(self, x, y, w, h):
        exact = self.mode.get((x, y, w))
        if exact is not None:
            return exact
        if not self.level:
            return None
        # smallest dimension, clamped into the searched level sizes
        sizes = sorted(self.level)
        s = min(w, h)
        s = max(sizes[0], min(sizes[-1], s))
        while s not in self.level:
            s //= 2
        lv = self.level[s]
        by, bx = y // s, x // s
        nby, nbx = lv["imode"].shape
        by, bx = min(by, nby - 1), min(bx, nbx - 1)
        if "inter" in lv and lv["inter"][by, bx]:
            return ("inter", (int(lv["mvx"][by, bx]),
                              int(lv["mvy"][by, bx])))
        return int(lv["imode"][by, bx])


def _pad_to_ctu(plane: np.ndarray, cs: int) -> np.ndarray:
    """Edge-pad a plane to CTU multiples (search-only; the commit pass
    works on the exact picture)."""
    H, W = plane.shape
    ph, pw = -H % cs, -W % cs
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _block_refs_from_plane(plane: np.ndarray, s: int):
    """Gather top[N, 2s+1]/left[N, 2s+1] for all s x s blocks of the
    plane (org-based search refs; borders replicate — the commit pass
    redoes exact reference substitution). One vectorized gather, no
    per-block host loop."""
    H, W = plane.shape
    pad = np.pad(plane, ((1, 2 * s), (1, 2 * s)), mode="edge")
    nby, nbx = H // s, W // s
    r = np.arange(2 * s + 1)
    by = (np.arange(nby) * s)[:, None, None]          # [nby,1,1]
    bx = (np.arange(nbx) * s)[None, :, None]          # [1,nbx,1]
    tops = pad[by, bx + r[None, None, :]]             # [nby,nbx,2s+1]
    lefts = pad[by + r[None, None, :], bx]
    return (np.ascontiguousarray(tops.reshape(-1, 2 * s + 1), np.int32),
            np.ascontiguousarray(lefts.reshape(-1, 2 * s + 1), np.int32))


def _blocks(plane: np.ndarray, s: int):
    H, W = plane.shape
    return (plane.reshape(H // s, s, W // s, s)
            .swapaxes(1, 2).reshape(-1, s, s))


@functools.partial(jax.jit, static_argnums=(3,))
def _level_cost(tops, lefts, blocks, s):
    """-> (best_mode [N], best_satd [N]) over all 67 modes."""
    preds = intra_batch.predict_all_modes(tops, lefts, s, s)   # [67,N,s,s]
    if s >= 8:
        costs = rdcost.satd(preds, blocks[None])               # [67, N]
    else:
        costs = rdcost.satd4(preds, blocks[None])
    best_mode = jnp.argmin(costs, axis=0)
    best_cost = jnp.min(costs, axis=0)
    return best_mode.astype(jnp.int32), best_cost.astype(jnp.int64)


def _device_block_refs(plane, s):
    """On-device twin of _block_refs_from_plane: top/left org-sample
    references for every s x s block, one gather."""
    H, W = plane.shape
    pad = jnp.pad(plane, ((1, 2 * s), (1, 2 * s)), mode="edge")
    nby, nbx = H // s, W // s
    r = jnp.arange(2 * s + 1)
    by = (jnp.arange(nby) * s)[:, None, None]
    bx = (jnp.arange(nbx) * s)[None, :, None]
    tops = pad[by, bx + r[None, None, :]].reshape(-1, 2 * s + 1)
    lefts = pad[by + r[None, None, :], bx].reshape(-1, 2 * s + 1)
    return tops, lefts


def _device_blocks(plane, s):
    H, W = plane.shape
    return (plane.reshape(H // s, s, W // s, s)
            .swapaxes(1, 2).reshape(-1, s, s))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _intra_frame_device(plane, lam_satd, cs, min_qt):
    """Whole-frame fused intra search: per-level 67-mode SATD + the
    bottom-up split DP, all in ONE device dispatch (one plane upload,
    a handful of small decision downloads). -> (modes, splits) dicts
    keyed by level size."""
    sizes = []
    s = cs
    while s >= min_qt:
        sizes.append(s)
        s //= 2
    modes, costs = {}, {}
    for s in sizes:
        tops, lefts = _device_block_refs(plane, s)
        blocks = _device_blocks(plane, s)
        preds = intra_batch.predict_all_modes(tops, lefts, s, s)
        if s >= 8:
            c = rdcost.satd(preds, blocks[None])
        else:
            c = rdcost.satd4(preds, blocks[None])
        nbx = plane.shape[1] // s
        modes[s] = jnp.argmin(c, axis=0).astype(jnp.int32) \
            .reshape(-1, nbx)
        costs[s] = (jnp.min(c, axis=0).astype(jnp.float32)
                    + lam_satd * 4.0).reshape(-1, nbx)
    splits = {}
    total = costs[sizes[-1]]
    for s in sizes[-1:0:-1]:
        parent = s * 2
        nby, nbx = total.shape
        agg = (total.reshape(nby // 2, 2, nbx // 2, 2).sum(axis=(1, 3))
               + lam_satd * 2.0)
        leaf = costs[parent]
        splits[parent] = agg < leaf
        total = jnp.minimum(leaf, agg)
    # pack everything into ONE int32 vector: a single device->host
    # transfer (per-array downloads dominate wall clock through the
    # TPU tunnel)
    parts = [modes[s].reshape(-1) for s in sizes]
    parts += [splits[s * 2].astype(jnp.int32).reshape(-1)
              for s in sizes[1:]]
    return jnp.concatenate(parts)


def _unpack_intra(flat, H, W, cs, min_qt):
    """Host-side unpack of _intra_frame_device's single output vector."""
    sizes = []
    s = cs
    while s >= min_qt:
        sizes.append(s)
        s //= 2
    modes, splits = {}, {}
    off = 0
    for s in sizes:
        n = (H // s) * (W // s)
        modes[s] = flat[off:off + n].reshape(H // s, W // s)
        off += n
    for s in sizes[1:]:
        p = s * 2
        n = (H // p) * (W // p)
        splits[p] = flat[off:off + n].reshape(H // p, W // p) != 0
        off += n
    return modes, splits


@functools.partial(jax.jit, static_argnums=(2,))
def _inter_satd(org, pred, s):
    """[N] SATD between co-indexed blocks of two planes cut into
    s x s blocks."""
    H, W = org.shape
    nby, nbx = H // s, W // s

    def blocks(p):
        return (p.reshape(nby, s, nbx, s).swapaxes(1, 2)
                .reshape(-1, s, s))
    a, b = blocks(org), blocks(pred)
    if s >= 8:
        return rdcost.satd(a[None], b[None])[0]
    return rdcost.satd4(a[None], b[None])[0]


def search_inter_frame(org: np.ndarray, ref: np.ndarray,
                       cfg: hls.SeqConfig, qp: int, me_range: int = 16,
                       split_hints: np.ndarray | None = None
                       ) -> SearchDecisions:
    """Batched whole-frame P-slice search (the FastInterCU deployment
    path): per QT level, a device full-search supplies the best
    integer MV per block (ops/me_batch._full_search) and its
    motion-compensated SATD competes with the batched 67-mode intra
    SATD; a bottom-up DP picks the partition; decisions feed the
    commit pass (("inter", mv_internal) or intra mode per leaf).

    split_hints: the MLT-CNN pruning contract at the CTU root, as in
    search_intra_frame.
    """
    from ..ops import me_batch

    cs = cfg.ctu_size
    # arbitrary picture sizes: search on an edge-padded CTU-multiple
    # plane; the commit pass forces the implicit border splits and
    # only consumes decisions for in-picture blocks
    org = _pad_to_ctu(org, cs)
    ref = _pad_to_ctu(ref, cs)
    H, W = org.shape
    min_qt = cfg.min_qt_inter
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    lam_satd = np.sqrt(lam)

    sizes = []
    s = cs
    while s >= min_qt:
        sizes.append(s)
        s //= 2

    jorg = jnp.asarray(org)
    jref = jnp.asarray(ref)
    level = {}
    for s in sizes:
        # intra leg (org-referenced, as in all-intra search)
        tops, lefts = _block_refs_from_plane(org, s)
        blocks = _blocks(org, s)
        imode, icost = _level_cost(jnp.asarray(tops), jnp.asarray(lefts),
                                   jnp.asarray(blocks), s)
        # inter leg: integer full search then MC-SATD of the winner
        dy, dx, _ = me_batch._full_search(jorg, jref, s, int(me_range))
        dy, dx = np.asarray(dy), np.asarray(dx)
        nby, nbx = H // s, W // s
        pad = np.pad(ref, me_range, mode="edge")
        rr = np.arange(s)
        row_idx = (np.arange(nby)[:, None, None, None] * s
                   + dy[:, :, None, None] + me_range
                   + rr[None, None, :, None])          # [nby,nbx,s,1]
        col_idx = (np.arange(nbx)[None, :, None, None] * s
                   + dx[:, :, None, None] + me_range
                   + rr[None, None, None, :])          # [nby,nbx,1,s]
        pred = (pad[row_idx, col_idx]                  # [nby,nbx,s,s]
                .transpose(0, 2, 1, 3).reshape(H, W))
        pcost = np.asarray(_inter_satd(jorg, jnp.asarray(pred), s),
                           np.float64)
        mv_bits = (np.abs(dy) + np.abs(dx)).reshape(-1) * 0.5 + 2.0
        icost = np.asarray(icost).astype(np.float64) + lam_satd * 4.0
        pcost = pcost + lam_satd * mv_bits
        use_inter = pcost < icost
        best = np.where(use_inter, pcost, icost)
        level[s] = {
            "cost": best.reshape(nby, nbx),
            "imode": np.asarray(imode).reshape(nby, nbx),
            "inter": use_inter.reshape(nby, nbx),
            "mvx": dx * 16, "mvy": dy * 16,
        }

    split = {}
    total = {sizes[-1]: level[sizes[-1]]["cost"]}
    for s in sizes[-1:0:-1]:
        parent = s * 2
        child_tot = total[s]
        nby, nbx = child_tot.shape
        agg = (child_tot.reshape(nby // 2, 2, nbx // 2, 2)
               .sum(axis=(1, 3)) + lam_satd * 2.0)
        leaf = level[parent]["cost"]
        total[parent] = np.minimum(leaf, agg)
        split[parent] = agg < leaf

    dec_split = {}
    dec_mode = {}

    def walk(x, y, s, forced=None):
        bx, by = x // s, y // s
        do_split = bool(split[s][by, bx]) if s > min_qt else False
        if forced is not None:
            do_split = bool(forced)
        dec_split[(x, y, s)] = do_split
        if do_split:
            hs = s // 2
            for (cx, cy) in ((x, y), (x + hs, y), (x, y + hs),
                             (x + hs, y + hs)):
                walk(cx, cy, hs)
        else:
            lv = level[s]
            if lv["inter"][by, bx]:
                dec_mode[(x, y, s)] = (
                    "inter", (int(lv["mvx"][by, bx]),
                              int(lv["mvy"][by, bx])))
            else:
                dec_mode[(x, y, s)] = int(lv["imode"][by, bx])

    for cy in range(H // cs):
        for cx_ in range(W // cs):
            forced = None
            if split_hints is not None and split_hints[cy, cx_] >= 0:
                forced = split_hints[cy, cx_] == 1
            walk(cx_ * cs, cy * cs, cs, forced)
    return SearchDecisions(dec_split, dec_mode, level)


def search_intra_frame_start(org: np.ndarray, cfg: hls.SeqConfig,
                             qp: int):
    """Dispatch the fused device search asynchronously; pair with
    search_intra_frame_finish (pipelines device search of frame n+1
    under the host commit pass of frame n)."""
    cs = cfg.ctu_size
    org = _pad_to_ctu(org, cs)
    H, W = org.shape
    min_qt = cfg.min_qt_intra
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    lam_satd = np.sqrt(lam)
    flat = _intra_frame_device(
        jnp.asarray(org, jnp.int32), jnp.float32(lam_satd), cs, min_qt)
    flat.copy_to_host_async()
    return (flat, H, W, cs, min_qt)


def search_intra_frame_finish(handle, split_hints: np.ndarray | None
                              = None) -> SearchDecisions:
    flat, H, W, cs, min_qt = handle
    mode_np, split = _unpack_intra(np.asarray(flat), H, W, cs, min_qt)

    # walk down recording decisions
    dec_split = {}
    dec_mode = {}

    def walk(x, y, s, forced=None):
        bx, by = x // s, y // s
        do_split = False
        if s > min_qt:
            do_split = bool(split[s][by, bx])
        if forced is not None:
            do_split = bool(forced)
        dec_split[(x, y, s)] = do_split
        if do_split:
            hs = s // 2
            for (cx, cy) in ((x, y), (x + hs, y), (x, y + hs),
                             (x + hs, y + hs)):
                walk(cx, cy, hs)
        else:
            dec_mode[(x, y, s)] = int(mode_np[s][by, bx])

    n_ctu_x = W // cs
    for cy in range(H // cs):
        for cx_ in range(n_ctu_x):
            forced = None
            if split_hints is not None and split_hints[cy, cx_] >= 0:
                forced = split_hints[cy, cx_] == 1
            walk(cx_ * cs, cy * cs, cs, forced)
    return SearchDecisions(dec_split, dec_mode,
                           {s: {"imode": mode_np[s]} for s in mode_np})


def search_intra_frame(org: np.ndarray, cfg: hls.SeqConfig, qp: int,
                       split_hints: np.ndarray | None = None
                       ) -> SearchDecisions:
    """QT-only batched search over the whole frame.

    split_hints: optional per-CTU array [nCtuY, nCtuX] with
    -1 = no hint, 0 = force no-split at CTU root, 1 = force QT at root
    (the MLT-CNN pruning contract; reference EncModeCtrl::setNewModeList).
    """
    return search_intra_frame_finish(
        search_intra_frame_start(org, cfg, qp), split_hints)
