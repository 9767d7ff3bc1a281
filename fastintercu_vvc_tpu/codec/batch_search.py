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
    pass. split[(x, y, s)] -> bool (QT split); mode[(x, y, s)] -> int."""
    split: dict
    mode: dict


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
    redoes exact reference substitution)."""
    H, W = plane.shape
    pad = np.pad(plane, ((1, 2 * s), (1, 2 * s)), mode="edge")
    nby, nbx = H // s, W // s
    tops = np.zeros((nby * nbx, 2 * s + 1), np.int32)
    lefts = np.zeros((nby * nbx, 2 * s + 1), np.int32)
    i = 0
    for by in range(nby):
        for bx in range(nbx):
            y, x = by * s, bx * s
            tops[i] = pad[y, x:x + 2 * s + 1]
            lefts[i] = pad[y:y + 2 * s + 1, x]
            i += 1
    return tops, lefts


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
        pred = np.empty((H, W), org.dtype)
        pad = np.pad(ref, me_range, mode="edge")
        for by in range(nby):
            for bx in range(nbx):
                yy, xx = by * s, bx * s
                pred[yy:yy + s, xx:xx + s] = pad[
                    me_range + yy + dy[by, bx]:
                    me_range + yy + dy[by, bx] + s,
                    me_range + xx + dx[by, bx]:
                    me_range + xx + dx[by, bx] + s]
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
    return SearchDecisions(dec_split, dec_mode)


def search_intra_frame(org: np.ndarray, cfg: hls.SeqConfig, qp: int,
                       split_hints: np.ndarray | None = None
                       ) -> SearchDecisions:
    """QT-only batched search over the whole frame.

    split_hints: optional per-CTU array [nCtuY, nCtuX] with
    -1 = no hint, 0 = force no-split at CTU root, 1 = force QT at root
    (the MLT-CNN pruning contract; reference EncModeCtrl::setNewModeList).
    """
    cs = cfg.ctu_size
    org = _pad_to_ctu(org, cs)
    H, W = org.shape
    min_qt = cfg.min_qt_intra
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    # SATD operates in the pel domain; mode+split bits scaled by sqrt(lam)
    # (VTM uses lambda_motion = sqrt(lam) for SATD-domain costs)
    lam_satd = np.sqrt(lam)

    sizes = []
    s = cs
    while s >= min_qt:
        sizes.append(s)
        s //= 2

    level = {}
    for s in sizes:
        tops, lefts = _block_refs_from_plane(org, s)
        blocks = _blocks(org, s)
        mode, cost = _level_cost(jnp.asarray(tops), jnp.asarray(lefts),
                                 jnp.asarray(blocks), s)
        mode = np.asarray(mode)
        cost = np.asarray(cost).astype(np.float64)
        nbx = W // s
        # leaf cost = SATD + mode-bits estimate (~4 bits)
        level[s] = (mode.reshape(-1, nbx), cost.reshape(-1, nbx)
                    + lam_satd * 4.0)

    # bottom-up DP: total[s] = min(leaf, sum of 4 children + split bits)
    split = {}
    mode = {}
    total = {sizes[-1]: level[sizes[-1]][1]}
    for s in sizes[-1:0:-1]:   # from smallest up (excluding the largest)
        parent = s * 2
        child_tot = total[s]
        nby, nbx = child_tot.shape
        agg = (child_tot.reshape(nby // 2, 2, nbx // 2, 2)
               .sum(axis=(1, 3)) + lam_satd * 2.0)
        leaf = level[parent][1]
        total[parent] = np.minimum(leaf, agg)
        split[parent] = agg < leaf

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
            dec_mode[(x, y, s)] = int(level[s][0][by, bx])

    n_ctu_x = W // cs
    for cy in range(H // cs):
        for cx_ in range(n_ctu_x):
            forced = None
            if split_hints is not None and split_hints[cy, cx_] >= 0:
                forced = split_hints[cy, cx_] == 1
            walk(cx_ * cs, cy * cs, cs, forced)
    return SearchDecisions(dec_split, dec_mode)
