"""Batched intra prediction — all 67 modes for N same-geometry blocks in
one jitted call (the TPU-first replacement for VTM's per-PU scalar loop,
IntraPrediction.cpp::predIntraAng).

Design: every angular mode's reference handling (main-ref extension for
negative angles, per-row deltaInt/deltaFract, 4-tap filter choice, PDPC)
is *static* given (mode, w, h). We precompute integer gather-index and
weight tables once per geometry on host, and the device computation is
pure gathers + small einsums over [N, ...] tensors — integer-exact with
the scalar ops/intra.py path (verified by tests).

Reference arrays per block use the same layout as ops/intra.py:
  top[N, 2W+1] (corner first), left[N, 2H+1].
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import intra

# Combined ref vector r = concat(top[0:2W+1], left[1:2H+1]) of length
# 2W + 2H + 1; index helpers:


def _r_top(i, w):           # top[i] -> r index
    return i


def _r_left(i, w):          # left[i] (i >= 1) -> r index
    return 2 * w + i


@functools.lru_cache(maxsize=None)
def _mode_plan(mode: int, w: int, h: int, bit_depth: int = 10):
    """Precompute static tables for one (mode, w, h).

    Returns dict with numpy arrays describing the device computation:
      kind: 'planar' | 'dc' | 'ang'
      filter_refs: bool — whether to apply [1 2 1] smoothing first
      For 'ang': transpose (bool), main_idx [L] (r indices for refMain,
      offset so refMain[j] = r[main_idx[j]]), tap_idx [H, W, ntaps] into
      refMain, tap_w [H, ntaps], int_slope (bool), pdpc tables.
    """
    params = intra.pred_params(mode, w, h)
    plan = {"filter_refs": params["refFilter"], "params": params}
    if mode == intra.PLANAR_IDX:
        plan["kind"] = "planar"
        plan["pdpc"] = params["applyPDPC"]
        return plan
    if mode == intra.DC_IDX:
        plan["kind"] = "dc"
        plan["pdpc"] = params["applyPDPC"]
        return plan

    plan["kind"] = "ang"
    pred_mode = params["predMode"]
    is_ver, ang, abs_inv = intra._angle_params(pred_mode)
    width, height = (w, h) if is_ver else (h, w)
    plan["transpose"] = not is_ver

    # main/side r-index maps (main = top for ver, left for hor)
    def main_r(i):
        return _r_top(i, w) if is_ver else (_r_left(i, w) if i >= 1 else 0)

    def side_r(i):
        return (_r_left(i, w) if i >= 1 else 0) if is_ver else _r_top(i, w)

    if ang < 0:
        off = height
        L = height + width + 2
        main_idx = np.zeros(L, np.int32)
        for i in range(width + 2):
            main_idx[i + off] = main_r(i)
        for k in range(-height, 0):
            idx = min((-k * abs_inv + 256) >> 9, height)
            main_idx[k + off] = side_r(idx)
    else:
        off = 0
        refLength = 2 * width
        L = refLength + 3
        main_idx = np.zeros(L, np.int32)
        for i in range(refLength + 1):
            main_idx[i] = main_r(i)
        main_idx[refLength + 1] = main_r(refLength)
        main_idx[refLength + 2] = main_r(refLength)
    plan["main_idx"] = main_idx

    int_slope = intra.is_integer_slope(abs(ang))
    plan["int_slope"] = int_slope and ang != 0
    plan["pure"] = ang == 0

    ys = np.arange(height)
    delta_pos = ang * (ys + 1)
    delta_int = delta_pos >> 5
    delta_fract = delta_pos & 31

    if ang == 0:
        tap_idx = (off + 1 + np.arange(width))[None, :].repeat(height, 0)
        plan["tap_idx"] = tap_idx[..., None]
        plan["tap_w"] = np.full((height, 1), 64, np.int32)
    elif plan["int_slope"]:
        tap_idx = off + delta_int[:, None] + 1 + np.arange(width)[None, :]
        plan["tap_idx"] = tap_idx[..., None]
        plan["tap_w"] = np.full((height, 1), 64, np.int32)
    else:
        use_cubic = not params["interpFilter"]
        tw = np.zeros((height, 4), np.int32)
        for y in range(height):
            f = delta_fract[y]
            if use_cubic:
                tw[y] = intra.CHROMA_FILTER[f]
            else:
                tw[y] = [16 - (f >> 1), 32 - (f >> 1), 16 + (f >> 1), f >> 1]
        base = off + delta_int[:, None] + np.arange(width)[None, :]
        tap_idx = base[..., None] + np.arange(4)[None, None, :]
        plan["tap_idx"] = tap_idx.astype(np.int32)
        plan["tap_w"] = tw
    plan["needs_round"] = not (plan["pure"] or plan["int_slope"])

    # PDPC tables
    if params["applyPDPC"]:
        if ang == 0:
            scale = ((width.bit_length() - 1) + (height.bit_length() - 1)
                     - 2) >> 2
            nx = min(3 << scale, width)
            plan["pdpc_kind"] = "pure"
            plan["pdpc_nx"] = nx
            plan["pdpc_wl"] = np.asarray(
                [32 >> ((2 * xx) >> scale) for xx in range(nx)], np.int32)
            plan["pdpc_topleft_idx"] = main_idx[off]
            plan["pdpc_side_idx"] = np.asarray(
                [side_r(1 + yy) for yy in range(height)], np.int32)
        else:
            scale = params["angularScale"]
            nx = min(3 << scale, width)
            plan["pdpc_kind"] = "ang"
            plan["pdpc_nx"] = nx
            plan["pdpc_wl"] = np.asarray(
                [32 >> ((2 * xx) >> scale) for xx in range(nx)], np.int32)
            # side index per (y, x): side[y + ((256 + (x+1)*absInv) >> 9) + 1]
            side_tab = np.zeros((height, nx), np.int32)
            for yy in range(height):
                inv_sum = 256
                for xx in range(nx):
                    inv_sum += abs_inv
                    sidx = yy + (inv_sum >> 9) + 1
                    side_tab[yy, xx] = side_r(min(sidx, 2 * height))
            plan["pdpc_side_tab"] = side_tab
    else:
        plan["pdpc_kind"] = None
    return plan


def _filter_refs_batch(r, w, h):
    """[1 2 1]/4 smoothing over the combined ref vector layout."""
    top = r[:, :2 * w + 1]
    left = jnp.concatenate([r[:, :1], r[:, 2 * w + 1:]], axis=1)
    corner = (left[:, 1] + 2 * top[:, 0] + top[:, 1] + 2) >> 2
    ft_mid = (top[:, :-2] + 2 * top[:, 1:-1] + top[:, 2:] + 2) >> 2
    fl_mid = (left[:, :-2] + 2 * left[:, 1:-1] + left[:, 2:] + 2) >> 2
    ftop = jnp.concatenate([corner[:, None], ft_mid, top[:, -1:]], axis=1)
    fleft = jnp.concatenate([fl_mid, left[:, -1:]], axis=1)
    return jnp.concatenate([ftop, fleft], axis=1)


def predict_batch(mode: int, top: jnp.ndarray, left: jnp.ndarray,
                  w: int, h: int, bit_depth: int = 10) -> jnp.ndarray:
    """Predict one mode for a batch: top[N, 2W+1], left[N, 2H+1]
    -> [N, h, w] int32. Bit-exact with ops.intra.predict."""
    plan = _mode_plan(mode, w, h, bit_depth)
    r = jnp.concatenate([top.astype(jnp.int32),
                         left[:, 1:].astype(jnp.int32)], axis=1)
    if plan["filter_refs"]:
        r = _filter_refs_batch(r, w, h)
    clip_hi = (1 << bit_depth) - 1

    if plan["kind"] == "planar":
        p = _planar_batch(r, w, h)
        if plan["pdpc"]:
            p = _pdpc_planar_dc_batch(p, r, w, h)
        return p
    if plan["kind"] == "dc":
        p = _dc_batch(r, w, h)
        if plan["pdpc"]:
            p = _pdpc_planar_dc_batch(p, r, w, h)
        return p

    ref_main = r[:, jnp.asarray(plan["main_idx"])]       # [N, L]
    tap_idx = jnp.asarray(plan["tap_idx"])               # [H, W, T]
    tap_w = jnp.asarray(plan["tap_w"])                   # [H, T]
    gathered = ref_main[:, tap_idx]                      # [N, H, W, T]
    acc = jnp.einsum("nhwt,ht->nhw", gathered, tap_w,
                     preferred_element_type=jnp.int32)
    if plan["needs_round"]:
        pred = (acc + 32) >> 6
        pred = jnp.clip(pred, 0, clip_hi)
    else:
        pred = gathered[..., 0]   # single tap with weight 64: pure copy

    if plan["pdpc_kind"] == "pure":
        nx = plan["pdpc_nx"]
        wl = jnp.asarray(plan["pdpc_wl"])                # [nx]
        top_left = r[:, int(plan["pdpc_topleft_idx"])][:, None, None]
        side = r[:, jnp.asarray(plan["pdpc_side_idx"])][:, :, None]  # [N,H,1]
        lead = pred[:, :, :nx]
        adj = lead + ((wl[None, None, :] * (side - top_left) + 32) >> 6)
        adj = jnp.clip(adj, 0, clip_hi)
        pred = jnp.concatenate([adj, pred[:, :, nx:]], axis=2)
    elif plan["pdpc_kind"] == "ang":
        nx = plan["pdpc_nx"]
        wl = jnp.asarray(plan["pdpc_wl"])                # [nx]
        side = r[:, jnp.asarray(plan["pdpc_side_tab"])]  # [N, H, nx]
        lead = pred[:, :, :nx]
        adj = lead + ((wl[None, None, :] * (side - lead) + 32) >> 6)
        pred = jnp.concatenate([adj, pred[:, :, nx:]], axis=2)

    if plan["transpose"]:
        pred = jnp.swapaxes(pred, -1, -2)
    return pred.astype(jnp.int32)


def _planar_batch(r, w, h):
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    t = r[:, 1:w + 2]                        # top[1..w+1]
    l = r[:, 2 * w + 1:2 * w + 1 + h + 1]    # left[1..h+1]
    t = t.astype(jnp.int64)
    l = l.astype(jnp.int64)
    bottom_left = l[:, h][:, None]
    top_right = t[:, w][:, None]
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    bottom_row = bottom_left - t[:, :w]
    top_row = t[:, :w] << log2h
    right_col = top_right - l[:, :h]
    left_col = l[:, :h] << log2w
    ver = top_row[:, None, :] + (ys[None, :, None] + 1) * bottom_row[:, None, :]
    hor = left_col[:, :, None] + (xs[None, None, :] + 1) * right_col[:, :, None]
    return (((hor << log2h) + (ver << log2w) + (1 << (log2w + log2h)))
            >> (log2w + log2h + 1)).astype(jnp.int32)


def _dc_batch(r, w, h):
    t = r[:, 1:w + 1].astype(jnp.int64)
    l = r[:, 2 * w + 1:2 * w + 1 + h].astype(jnp.int64)  # left[1..h]
    if w == h:
        denom = w << 1
        s = t.sum(axis=1) + l.sum(axis=1)
    elif w > h:
        denom = w
        s = t.sum(axis=1)
    else:
        denom = h
        s = l.sum(axis=1)
    dc = (s + (denom >> 1)) >> (denom.bit_length() - 1)
    return jnp.broadcast_to(dc[:, None, None], (r.shape[0], h, w)
                            ).astype(jnp.int32)


def _pdpc_planar_dc_batch(pred, r, w, h):
    scale = (((w.bit_length() - 1) - 2 + (h.bit_length() - 1) - 2 + 2) >> 2)
    ys = np.arange(h)
    xs = np.arange(w)
    wT = jnp.asarray(32 >> np.minimum(31, (ys << 1) >> scale))
    wL = jnp.asarray(32 >> np.minimum(31, (xs << 1) >> scale))
    l = r[:, 2 * w + 1:2 * w + 1 + h].astype(jnp.int64)[:, :, None]
    t = r[:, 1:w + 1].astype(jnp.int64)[:, None, :]
    val = pred.astype(jnp.int64)
    out = val + ((wL[None, None, :] * (l - val)
                  + wT[None, :, None] * (t - val) + 32) >> 6)
    return out.astype(jnp.int32)


def predict_all_modes(top: jnp.ndarray, left: jnp.ndarray, w: int, h: int,
                      modes=None, bit_depth: int = 10) -> jnp.ndarray:
    """[n_modes, N, h, w] predictions (host loop over modes builds one
    fused jitted graph; each mode is static)."""
    modes = list(range(intra.NUM_LUMA_MODE)) if modes is None else modes
    preds = [predict_batch(m, top, left, w, h, bit_depth) for m in modes]
    return jnp.stack(preds, axis=0)
