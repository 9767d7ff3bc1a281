"""Whole-frame batched inter mode search — honest per-leaf costs.

The reference evaluates inter modes per CU inside the recursive RDO
(EncCu.cpp:541-1087): a merge SATD prepass over the candidate list
(EncCu.cpp:2435), TZ integer search + fractional refinement
(InterSearch.cpp:3299/4283), and bi-prediction.  Here the SAME
ingredients are evaluated for EVERY block of EVERY geometry class of a
frame in one jitted device pass (SURVEY.md §7.1 "batch, don't
recurse"):

  1. integer-pel field: one 8x8-granularity SAD map per reference
     (aggregated per class) plus a quarter-resolution coarse map that
     extends the effective range 4x (TZ raster-search analog);
  2. candidate screen per block: {int-best, coarse-best, zero,
     collocated (TMVP analog), left/top neighbor MVs} x references,
     costed by exact-tap MC SATD + estimated rate (merge-idx bits for
     the predictor-like candidates, mvd bits for the searched ones);
  3. half- then quarter-pel refinement of the searched winner with the
     real 8-tap interpolation (xPatternSearchFracDIF analog);
  4. bi-prediction of the per-list winners (average, as the SATD
     screen in InterSearch does before BDOF/DMVR).

Outputs per class: cost + a full motion decision (inter_dir, per-list
ref + 1/16-pel MV, and whether the winner is predictor-like so the
commit pass can map it onto the exact merge list).  The commit pass
(codec/encoder._forced_inter_leaf) does no screening of its own.

Interpolation note: the generic separable two-pass path is used for
all fractional positions (taps are per-block gathers, so one fused
kernel serves every MV); integer and pure-frac positions differ from
the normative single-pass rounding by at most 1 LSB — fine for search
costs, and the commit pass regenerates normative predictions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import rdcost
from .inter import (LUMA_FILTER, IF_INTERNAL_PREC, IF_FILTER_PREC,
                    IF_INTERNAL_OFFS)

# gather-window safety margin: candidate MVs are clipped to +-MAXMV_INT
# integer pels (coarse map reaches +-4*sr; collocated MVs arbitrary)
PAD = 80
MAXMV_INT = PAD - 5


def _clip_mv(mv):
    lim = MAXMV_INT << 4
    return jnp.clip(mv, -lim, lim)


def mc_frac_batch(pads, ref_sel, py, px, mvx, mvy, h, w, bd=10):
    """Batched luma MC: [N] blocks, per-block reference + 1/16-pel MV.

    pads: [R, Hp, Wp] edge-padded (PAD) reference planes.
    py/px: block origins in padded coordinates ([N]).
    -> [N, h, w] int32 pel-domain prediction.
    """
    ix = px + (mvx >> 4) - 3
    iy = py + (mvy >> 4) - 3
    fx = mvx & 15
    fy = mvy & 15
    rows = iy[:, None] + jnp.arange(h + 7)[None, :]
    cols = ix[:, None] + jnp.arange(w + 7)[None, :]
    win = pads[ref_sel[:, None, None], rows[:, :, None],
               cols[:, None, :]].astype(jnp.int32)
    head = IF_INTERNAL_PREC - bd
    shift1 = IF_FILTER_PREC - head
    off1 = -IF_INTERNAL_OFFS << shift1
    shift2 = IF_FILTER_PREC + head
    off2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
    taps = jnp.asarray(LUMA_FILTER)
    tx = taps[fx]                                     # [N, 8]
    ty = taps[fy]
    tmp = sum(win[:, :, k:k + w] * tx[:, k, None, None]
              for k in range(8))
    tmp = (tmp + off1) >> shift1
    acc = sum(tmp[:, k:k + h, :] * ty[:, k, None, None]
              for k in range(8))
    out = (acc + off2) >> shift2
    return jnp.clip(out, 0, (1 << bd) - 1)


def _satd_c(a, b, w, h):
    if w >= 8 and h >= 8:
        return rdcost.satd(a, b)
    return rdcost.satd4(a, b)


def _mvd_bits_j(d):
    """Estimated CABAC bits of one quarter-pel mvd component
    (abs_mvd_greater0/1 flags + EG1 + sign; CABACWriter::mvd_coding)."""
    a = jnp.abs(d).astype(jnp.float32)
    eg = jnp.where(a >= 2.0,
                   2.0 * jnp.floor(jnp.log2(jnp.maximum(a, 2.0))) + 1.0,
                   0.0)
    return jnp.where(a == 0, 1.0, 2.0 + 1.0 + eg)


def _mv_bits(mvx, mvy, pmx, pmy):
    """mvd rate in quarter-pel vs a predictor (internal 1/16 input)."""
    dx = ((mvx - pmx) + 2) >> 2
    dy = ((mvy - pmy) + 2) >> 2
    return _mvd_bits_j(dx) + _mvd_bits_j(dy)


# ---------------------------------------------------------------------------
# SAD maps


@functools.partial(jax.jit, static_argnums=(2, 3))
def sad_map(org, ref, sr, bs=8):
    """[K, nby, nbx] int32: SAD of every aligned bs x bs block at every
    integer displacement in [-sr, sr]^2 (K = (2sr+1)^2, dy-major).

    Batched by displacement ROW: a serial lax.map over all (2sr+1)^2
    displacements dominated the whole-frame search wall time on TPU
    (~2000 sequential micro-steps per frame); one vmap'd row of 2sr+1
    column shifts keeps the intermediate at (2sr+1) x H x W (~13 MB at
    416x240, sr 16) while cutting the sequential depth to 2sr+1."""
    H, W = org.shape
    side = 2 * sr + 1
    pad = jnp.pad(ref, sr, mode="edge")
    offs = jnp.arange(side)
    orgi = org.astype(jnp.int32)

    def row(dy):
        strip = jax.lax.dynamic_slice(pad, (dy, 0), (H, W + 2 * sr))

        def col(dx):
            win = jax.lax.dynamic_slice(strip, (0, dx), (H, W))
            d = jnp.abs(orgi - win.astype(jnp.int32))
            return d.reshape(H // bs, bs, W // bs, bs).sum(axis=(1, 3))

        return jax.vmap(col)(offs)

    return jax.lax.map(row, offs).reshape(side * side, H // bs,
                                          W // bs)


def _downsample4(p):
    H, W = p.shape
    return ((p.astype(jnp.int32)
             .reshape(H // 4, 4, W // 4, 4).sum(axis=(1, 3)) + 8) >> 4)


def class_grid(H, W, w, h):
    """Half-stride position grids (TT support): every CU of size (w, h)
    sits at a multiple of (max(h/2, 8), max(w/2, 8)) — TT middle
    children are offset by half their own size, everything else is
    own-size aligned (UnitPartitioner geometry)."""
    sy, sx = max(h // 2, 8), max(w // 2, 8)
    ys = np.arange((H - h) // sy + 1) * sy
    xs = np.arange((W - w) // sx + 1) * sx
    return ys, xs


def _integral(m):
    """[..., a, b] -> [..., a+1, b+1] 2D inclusive prefix sums."""
    c = jnp.cumsum(jnp.cumsum(m, axis=-1), axis=-2)
    c = jnp.pad(c, [(0, 0)] * (m.ndim - 2) + [(1, 0), (1, 0)])
    return c


def _best_from_map(smap, sr):
    """[R, K, nby, nbx] -> (ref [nby,nbx], dy, dx, cost) over refs and
    displacements."""
    R, K = smap.shape[0], smap.shape[1]
    side = 2 * sr + 1
    flat = smap.reshape(R * K, smap.shape[2], smap.shape[3])
    idx = jnp.argmin(flat, axis=0)
    cost = jnp.min(flat, axis=0)
    ref = (idx // K).astype(jnp.int32)
    disp = (idx % K).astype(jnp.int32)
    dy = disp // side - sr
    dx = disp % side - sr
    return ref, dy, dx, cost


# ---------------------------------------------------------------------------
# the per-frame search kernel


def mc_frac_batch_t(pads, ref_sel, py, px, mvx, mvy, h, w, bd=10):
    """Lanes-last batched luma MC: [M] blocks -> [h, w, M] int32.

    Bit-identical math to mc_frac_batch but with the block dimension
    MINOR: the gather window is [h+7, w+7, M] so the 128-wide vector
    lanes run across blocks (M ~ 10^3) instead of across a (w+7)-
    sample row (8..23 samples -> >80% lane waste) — the layout fix
    that took the per-class candidate screen from ~300 ms to the
    single-digit-ms range on TPU.
    """
    ix = px + (mvx >> 4) - 3
    iy = py + (mvy >> 4) - 3
    fx = mvx & 15
    fy = mvy & 15
    # window fetch as a vmap'd dynamic_slice: M start indices each
    # pulling a contiguous (h+7, w+7) block — XLA lowers this to a
    # sliced gather, ~4x faster on TPU than the per-element gather of
    # broadcast row/col index arrays (measured 14 vs 59 ms for 8.9k
    # 23x23 windows); pads may be int16 to halve the fetched bytes

    def _one(r, y, x):
        return jax.lax.dynamic_slice(pads, (r, y, x),
                                     (1, h + 7, w + 7))[0]

    win = jnp.transpose(jax.vmap(_one)(ref_sel, iy, ix),
                        (1, 2, 0)).astype(jnp.int32)      # [h+7, w+7, M]
    head = IF_INTERNAL_PREC - bd
    shift1 = IF_FILTER_PREC - head
    off1 = -IF_INTERNAL_OFFS << shift1
    shift2 = IF_FILTER_PREC + head
    off2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
    taps = jnp.asarray(LUMA_FILTER)
    tx = taps[fx]                                         # [M, 8]
    ty = taps[fy]
    tmp = sum(win[:, k:k + w, :] * tx[:, k][None, None, :]
              for k in range(8))
    tmp = (tmp + off1) >> shift1
    acc = sum(tmp[k:k + h, :, :] * ty[:, k][None, None, :]
              for k in range(8))
    out = (acc + off2) >> shift2
    return jnp.clip(out, 0, (1 << bd) - 1)


def _satd_t(a, b, w, h):
    if w >= 8 and h >= 8:
        return rdcost.satd_t(a, b)
    return rdcost.satd4_t(a, b)


def _list_leg(org, pads, sadii, coarse_field, col_field, col_valid,
              w, h, sr, bd, lam, n_ref, ref_bits):
    """One reference list for one class: candidate screen + refinement.

    sadii: [R, K, nb8y+1, nb8x+1] integral images of the 8x8 SAD maps
    (arbitrary 8-aligned windows — the half-stride grids overlap, so
    aggregation is 4 gathers instead of a reshape).
    coarse_field: [nc y, nc x, 3] (ref, dy4, dx4) best from the coarse
    map at 32x32 granularity, full-res integer pels.
    col_field/col_valid: [n_ref, H8, W8, 2] / [n_ref, H8, W8]
    collocated candidates (internal units) per target ref.
    -> dict(mv [N,2] internal, ref [N], cost [N], bits [N], mlike [N],
            pred [h,w,N] lanes-last, blocks [h,w,N])

    TPU shape discipline: every MC+SATD runs lanes-last (blocks minor)
    and candidates are evaluated in ONE batched MC call per stage
    (screen, half-pel, quarter-pel) instead of a 22-step sequential
    scan — the scan serialized the device and its [N, h, w] layout
    wasted the vector lanes (round-5 profiling: ~300 ms/class, the
    whole-frame search bottleneck).
    """
    H, W = org.shape
    ys, xs = class_grid(H, W, w, h)
    nby, nbx = len(ys), len(xs)
    N = nby * nbx
    jys, jxs = jnp.asarray(ys), jnp.asarray(xs)
    blocks = jnp.transpose(
        org[jys[:, None, None, None] + jnp.arange(h)[None, None, :, None],
            jxs[None, :, None, None] + jnp.arange(w)[None, None, None, :]
            ].reshape(N, h, w), (1, 2, 0))             # [h, w, N]
    py = jnp.repeat(jys, nbx) + PAD
    px = jnp.tile(jxs, nby) + PAD

    # integer best per class tile (over refs): window-summed SAD map
    y0 = (jys // 8)[:, None]
    x0 = (jxs // 8)[None, :]
    fh, fw = h // 8, w // 8
    agg = (sadii[:, :, y0 + fh, x0 + fw] - sadii[:, :, y0, x0 + fw]
           - sadii[:, :, y0 + fh, x0] + sadii[:, :, y0, x0])
    ref_i, dy_i, dx_i, _ = _best_from_map(agg, sr)      # [nby, nbx]
    mv_int = jnp.stack([dx_i << 4, dy_i << 4], -1).reshape(N, 2)
    ref_int = ref_i.reshape(N)

    # neighbor predictors from the int-best field (spatial merge analog)
    mvf = jnp.stack([dx_i << 4, dy_i << 4], -1)        # [nby, nbx, 2]
    left = jnp.concatenate([mvf[:, :1], mvf[:, :-1]], axis=1)
    top = jnp.concatenate([mvf[:1, :], mvf[:-1, :]], axis=0)
    reff = ref_i
    left_r = jnp.concatenate([reff[:, :1], reff[:, :-1]], axis=1)
    top_r = jnp.concatenate([reff[:1, :], reff[:-1, :]], axis=0)

    # coarse (extended-range) candidate: 32x32-granularity field lookup
    cy = jnp.minimum((jys + h // 2) // 32, coarse_field.shape[0] - 1)
    cx = jnp.minimum((jxs + w // 2) // 32, coarse_field.shape[1] - 1)
    cf = coarse_field[cy[:, None], cx[None, :]]        # [nby, nbx, 3]
    mv_coarse = jnp.stack([cf[..., 2] << 4, cf[..., 1] << 4],
                          -1).reshape(N, 2)
    ref_coarse = cf[..., 0].reshape(N).astype(jnp.int32)

    # collocated candidate (target ref 0)
    gy = jnp.minimum((jys + h // 2) // 8, col_field.shape[1] - 1)
    gx = jnp.minimum((jxs + w // 2) // 8, col_field.shape[2] - 1)
    mv_col = col_field[0][gy[:, None], gx[None, :]].reshape(N, 2)
    ok_col = col_valid[0][gy[:, None], gx[None, :]].reshape(N)

    zeros = jnp.zeros((N, 2), jnp.int32)
    z32 = jnp.zeros((N,), jnp.int32)

    cand_mv = jnp.stack([mv_int, mv_coarse, zeros, mv_col,
                         left.reshape(N, 2), top.reshape(N, 2)], 0)
    cand_mv = _clip_mv(cand_mv)                        # [C, N, 2]
    cand_ref = jnp.stack([ref_int, ref_coarse, z32, z32,
                          left_r.reshape(N), top_r.reshape(N)], 0)
    C = cand_mv.shape[0]

    # rates: searched candidates pay mvd vs the left predictor;
    # predictor-like candidates pay merge-flag + merge-idx bits
    pmx = left.reshape(N, 2)[:, 0]
    pmy = left.reshape(N, 2)[:, 1]
    amvp_over = 5.0 + ref_bits * (cand_ref > 0)        # [C, N]
    mvb = _mv_bits(cand_mv[..., 0], cand_mv[..., 1],
                   pmx[None, :], pmy[None, :])
    rate_amvp = mvb + amvp_over
    mrank = jnp.asarray([0., 0., 1., 2., 3., 4.], jnp.float32)
    rate_merge = 1.0 + 1.0 + mrank[:, None] + jnp.zeros((1, N))
    is_pred_like = jnp.asarray([False, False, True, True, True, True])
    rate = jnp.where(is_pred_like[:, None], rate_merge, rate_amvp)
    bad = jnp.zeros((C, N), bool).at[3].set(~ok_col)

    # candidate screen: ONE lanes-last MC over all C*N instances
    flat_mv = cand_mv.reshape(C * N, 2)
    flat_ref = cand_ref.reshape(C * N)
    preds = mc_frac_batch_t(pads, flat_ref, jnp.tile(py, C),
                            jnp.tile(px, C), flat_mv[:, 0],
                            flat_mv[:, 1], h, w, bd)     # [h, w, C*N]
    satd = _satd_t(preds.reshape(h, w, C, N),
                   blocks[:, :, None, :], w, h).astype(jnp.float32)
    cost = satd + lam * rate + jnp.where(bad, 1e18, 0.0)   # [C, N]
    kbest = jnp.argmin(cost, axis=0)                        # [N]
    nidx = jnp.arange(N)
    best_cost = cost[kbest, nidx]
    best_mv = cand_mv[kbest, nidx]
    best_ref = cand_ref[kbest, nidx]
    best_bits = rate[kbest, nidx]
    best_mlike = is_pred_like[kbest]
    best_pred = jnp.take_along_axis(
        preds.reshape(h, w, C, N), kbest[None, None, None, :],
        axis=2)[:, :, 0, :]                                 # [h, w, N]

    # fractional refinement of the searched winner (half then quarter);
    # the merge-like winner is kept untouched so the commit pass can
    # map it onto the exact merge candidate list.
    # HBM discipline: the 8 neighbors of a round sit within +-1
    # integer pel of the round's center, so ONE (h+9) x (w+9) window
    # per block serves the whole round — each neighbor's prediction is
    # the window filtered with a 10-tap "extended" filter (the 8-tap
    # phase filter placed at local shift 0/1/2), algebraically
    # identical to refetching a shifted window. Cuts the per-round
    # window traffic 8x.
    ext_np = np.zeros((16, 3, 10), np.int64)
    for f in range(16):
        for sft in range(3):
            ext_np[f, sft, sft:sft + 8] = np.asarray(LUMA_FILTER)[f]
    ext_taps = jnp.asarray(ext_np)
    head = IF_INTERNAL_PREC - bd
    shift1 = IF_FILTER_PREC - head
    off1 = -IF_INTERNAL_OFFS << shift1
    shift2 = IF_FILTER_PREC + head
    off2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
    ref_mv, ref_cost, ref_pred = best_mv, best_cost, best_pred
    for step in (8, 4):
        offs = jnp.asarray(
            [(-step, 0), (step, 0), (0, -step), (0, step),
             (-step, -step), (step, step), (-step, step),
             (step, -step)], jnp.int32)
        rmv = _clip_mv(ref_mv[None, :, :] + offs[:, None, :])  # [8,N,2]
        cix = px + (ref_mv[:, 0] >> 4) - 4
        ciy = py + (ref_mv[:, 1] >> 4) - 4

        def _onewin(r, y, x):
            return jax.lax.dynamic_slice(pads, (r, y, x),
                                         (1, h + 9, w + 9))[0]

        win = jnp.transpose(jax.vmap(_onewin)(best_ref, ciy, cix),
                            (1, 2, 0)).astype(jnp.int32)  # [h+9,w+9,N]
        shx = (rmv[..., 0] >> 4) - (ref_mv[:, 0] >> 4)[None, :] + 1
        shy = (rmv[..., 1] >> 4) - (ref_mv[:, 1] >> 4)[None, :] + 1
        tx = ext_taps[rmv[..., 0] & 15, shx]              # [8, N, 10]
        ty = ext_taps[rmv[..., 1] & 15, shy]
        tmp = sum(win[:, l:l + w, None, :]
                  * tx[None, None, :, :, l] for l in range(10))
        tmp = (tmp + off1) >> shift1                      # [h+9,w,8,N]
        acc = sum(tmp[k:k + h] * ty[:, :, k][None, None, :, :]
                  for k in range(10))
        rpred = jnp.clip((acc + off2) >> shift2, 0,
                         (1 << bd) - 1)                   # [h, w, 8, N]
        rsatd = _satd_t(rpred, blocks[:, :, None, :], w, h
                        ).astype(jnp.float32)              # [8, N]
        rbits = _mv_bits(rmv[..., 0], rmv[..., 1], pmx[None, :],
                         pmy[None, :]) + 5.0 \
            + ref_bits * (best_ref > 0)[None, :]
        rcost = rsatd + lam * rbits                        # [8, N]
        allc = jnp.concatenate([ref_cost[None, :], rcost], 0)  # [9, N]
        k9 = jnp.argmin(allc, axis=0)                      # [N]
        ref_cost = allc[k9, nidx]
        allmv = jnp.concatenate([ref_mv[None], rmv], 0)    # [9, N, 2]
        ref_mv = allmv[k9, nidx]
        allp = jnp.concatenate([ref_pred[:, :, None, :],
                                rpred.reshape(h, w, 8, N)], 2)
        ref_pred = jnp.take_along_axis(
            allp, k9[None, None, None, :], axis=2)[:, :, 0, :]
    out_bits = _mv_bits(ref_mv[:, 0], ref_mv[:, 1], pmx, pmy) + 5.0 \
        + ref_bits * (best_ref > 0)

    take_ref = (~best_mlike) & (ref_cost < best_cost)
    out_mv = jnp.where(take_ref[:, None], ref_mv, best_mv)
    out_cost = jnp.where(take_ref, ref_cost, best_cost)
    out_pred = jnp.where(take_ref[None, None, :], ref_pred, best_pred)
    out_bits = jnp.where(take_ref, out_bits, best_bits)
    return {"mv": out_mv, "ref": best_ref, "cost": out_cost,
            "bits": out_bits, "mlike": best_mlike, "pred": out_pred,
            "blocks": blocks}


def _class_device_body(org, pads0, pads1, sadii_0, sadii_1,
                       coarse0, coarse1, col0, col0_ok, col1, col1_ok,
                       lam, w, h, sr, bd, n0, n1):
    """One geometry class: both list legs + bi. Jitted per class so
    compiles are incremental and shared across CTU configurations."""
    iv_parts, cv_parts = [], []
    for _ in (0,):
        l0 = _list_leg(org, pads0, sadii_0, coarse0, col0, col0_ok,
                       w, h, sr, bd, lam, n0, 1.0)
        if n1 > 0:
            l1 = _list_leg(org, pads1, sadii_1, coarse1, col1, col1_ok,
                           w, h, sr, bd, lam, n1, 1.0)
            # bi: average of per-list winners (SATD screen analog);
            # inter_dir overhead ~2 bits
            bi_pred = (l0["pred"].astype(jnp.int32)
                       + l1["pred"].astype(jnp.int32) + 1) >> 1
            bi_satd = _satd_t(bi_pred, l0["blocks"], w, h
                              ).astype(jnp.float32)
            bi_bits = l0["bits"] + l1["bits"] + 2.0
            bi_cost = bi_satd + lam * bi_bits
            costs = jnp.stack([l0["cost"], l1["cost"], bi_cost], 1)
            which = jnp.argmin(costs, axis=1)
            N = which.shape[0]
            dir_ = jnp.where(which == 0, 1,
                             jnp.where(which == 1, 2, 3)).astype(
                jnp.int32)
            mlike = jnp.where(
                which == 0, l0["mlike"],
                jnp.where(which == 1, l1["mlike"],
                          l0["mlike"] & l1["mlike"]))
            cost = costs[(jnp.arange(N), which)]
            iv = [dir_, l0["ref"], l0["mv"][:, 0], l0["mv"][:, 1],
                  l1["ref"], l1["mv"][:, 0], l1["mv"][:, 1],
                  mlike.astype(jnp.int32)]
        else:
            N = l0["cost"].shape[0]
            dir_ = jnp.ones((N,), jnp.int32)
            z = jnp.zeros((N,), jnp.int32)
            cost = l0["cost"]
            iv = [dir_, l0["ref"], l0["mv"][:, 0], l0["mv"][:, 1],
                  z, z, z, l0["mlike"].astype(jnp.int32)]
        iv_parts.append(jnp.stack(iv, 0).reshape(-1))
        cv_parts.append(cost)
    return jnp.concatenate(iv_parts), jnp.concatenate(cv_parts)


_class_device = jax.jit(_class_device_body,
                        static_argnums=(12, 13, 14, 15, 16, 17))


def _coarse_best(org, refs, sr):
    """Quarter-resolution SAD search -> [ncy, ncx, 3] (ref, dy, dx)
    best full-res integer displacement at 32x32 granularity."""
    org4 = _downsample4(org)
    maps = jnp.stack([sad_map(org4, _downsample4(r), sr) for r in refs])
    ref, dy, dx, _ = _best_from_map(maps, sr)
    return jnp.stack([ref, dy * 4, dx * 4], -1)


def pack_col_fields(col, n, H, W):
    """[(field [H8,W8,2], valid [H8,W8])] -> stacked jnp arrays (or
    all-invalid placeholders when empty)."""
    h8, w8 = H // 8, W // 8
    if col:
        f = jnp.stack([jnp.asarray(c[0], jnp.int32) for c in col])
        v = jnp.stack([jnp.asarray(c[1], bool) for c in col])
    else:
        f = jnp.zeros((max(n, 1), h8, w8, 2), jnp.int32)
        v = jnp.zeros((max(n, 1), h8, w8), bool)
    return f, v


def unpack_class_results(iv_all: np.ndarray, cv_all: np.ndarray,
                         classes, H, W):
    """Split the packed per-class decision/cost vectors back into the
    {(w, h): dict} result format."""
    out = {}
    ioff = coff = 0
    for (w, h) in classes:
        ys, xs = class_grid(H, W, w, h)
        nby, nbx = len(ys), len(xs)
        n = nby * nbx
        f = iv_all[ioff:ioff + 8 * n].reshape(8, nby, nbx)
        ioff += 8 * n
        out[(w, h)] = {
            "cost": cv_all[coff:coff + n].reshape(nby, nbx)
            .astype(np.float64),
            "dir": f[0], "ref0": f[1], "mv0x": f[2], "mv0y": f[3],
            "ref1": f[4], "mv1x": f[5], "mv1y": f[6],
            "mlike": f[7].astype(bool)}
        coff += n
    return out


def inter_frame_search(org_p: np.ndarray, refs0, refs1, col0, col1,
                       classes, qp: int, sr: int = 16,
                       bd: int = 10, mesh=None, lam_satd=None):
    """Run the whole-frame inter search.

    org_p: CTU-padded luma. refs0/refs1: [plane, ...] per list.
    col0/col1: per target-ref [(field [H8, W8, 2], valid [H8, W8])]
    collocated candidates (internal 1/16 units), or [] for none.
    lam_satd: SATD-domain rate weight. Pass the fused search's weight
    (sqrt(lambda) * FASTINTERCU_RATE_SCALE) so ONE weight governs the
    intra and inter legs and the DP (ADVICE r4: a locally recomputed
    sqrt(lambda) underweighted inter signalling bits ~4x vs intra).
    -> {(w, h): dict(cost, dir, ref0, mv0, ref1, mv1, mlike)} (numpy).
    """
    H, W = org_p.shape
    lam = float(lam_satd) if lam_satd is not None else \
        float(np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0)))
    jorg = jnp.asarray(org_p)

    def prep(refs):
        pads = jnp.stack([jnp.pad(jnp.asarray(r), PAD, mode="edge")
                          for r in refs])
        if mesh is not None:
            from ..parallel import fused_shard
            s8 = jnp.stack([jnp.asarray(fused_shard.sharded_sad8_map(
                org_p, np.asarray(r), sr, mesh)) for r in refs])
        else:
            s8 = jnp.stack([sad_map(jorg, jnp.asarray(r), sr)
                            for r in refs])
        coarse = _coarse_best(jorg, [jnp.asarray(r) for r in refs], sr)
        return pads, _integral(s8), coarse

    def prep_col(col, n):
        return pack_col_fields(col, n, H, W)

    pads0, s80, c0 = prep(refs0)
    if refs1:
        pads1, s81, c1 = prep(refs1)
    else:
        pads1, s81, c1 = pads0, s80, c0
    cf0, cv0 = prep_col(col0, len(refs0))
    cf1, cv1 = prep_col(col1, len(refs1))

    pend = {}
    for (w, h) in classes:
        pend[(w, h)] = _class_device(jorg, pads0, pads1, s80, s81,
                                     c0, c1, cf0, cv0, cf1, cv1, lam,
                                     w, h, sr, bd,
                                     len(refs0), len(refs1))
    # ONE packed download for each of (decisions, costs): per-array
    # device->host fetches pay a full tunnel round trip each
    iv_all = np.asarray(jnp.concatenate(
        [pend[c][0] for c in classes]))
    cv_all = np.asarray(jnp.concatenate(
        [pend[c][1] for c in classes]))
    return unpack_class_results(iv_all, cv_all, classes, H, W)
