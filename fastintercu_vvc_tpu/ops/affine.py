"""Affine motion model: subblock MV derivation, motion compensation
with PROF, and CPMV candidate math.

Parity map (reference: vtm-mlt-cpp/source/Lib):
  - subblock MV grid + spread-over-limit .. CommonLib/UnitTools.cpp:2866
    (PU::setAllAffineMv), CommonLib/InterPrediction.cpp:813
    (isSubblockVectorSpreadOverLimit)
  - affine MC + PROF ..................... CommonLib/InterPrediction.cpp:872
    (xPredAffineBlk), CommonLib/Buffer.cpp:45/114
    (applyPROFCore, gradFilterCore)
  - 4x4 luma 6-tap filter ................ CommonLib/InterpolationFilter.cpp:57
    (m_lumaFilter4x4; selected for any 4x4 luma block, :776)
  - inherited CPMV derivation ............ CommonLib/UnitTools.cpp:1994
    (PU::xInheritedAffineMv)
  - constructed-model corner conversion .. CommonLib/UnitTools.cpp:2353
    (PU::getAffineControlPointCand)

All MVs are internal 1/16-pel integer pairs. CPMV triples are
((ltx, lty), (rtx, rty), (lbx, lby)); the LB entry is ignored for the
4-parameter model. affine_type: 0 = 4-param, 1 = 6-param.
"""

from __future__ import annotations

import numpy as np

from . import inter

AFFINE_SUBBLOCK = 4
_IBIT = 7                      # MAX_CU_DEPTH
_MV_SHIFT = _IBIT - 4 + inter.MV_FRAC_BITS      # = 7
_MV_MAX = (1 << 17) - 1        # MV_BITS = 18 (CommonDef.h:462)
_MV_MIN = -(1 << 17)

# m_lumaFilter4x4 (InterpolationFilter.cpp:57): 6-tap stored as 8-tap
LUMA_FILTER_4x4 = np.asarray([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [0, 1, -3, 63, 4, -2, 1, 0],
    [0, 1, -5, 62, 8, -3, 1, 0],
    [0, 2, -8, 60, 13, -4, 1, 0],
    [0, 3, -10, 58, 17, -5, 1, 0],
    [0, 3, -11, 52, 26, -8, 2, 0],
    [0, 2, -9, 47, 31, -10, 3, 0],
    [0, 3, -11, 45, 34, -10, 3, 0],
    [0, 3, -11, 40, 40, -11, 3, 0],
    [0, 3, -10, 34, 45, -11, 3, 0],
    [0, 3, -10, 31, 47, -9, 2, 0],
    [0, 2, -8, 26, 52, -11, 3, 0],
    [0, 1, -5, 17, 58, -10, 3, 0],
    [0, 1, -4, 13, 60, -8, 2, 0],
    [0, 1, -3, 8, 62, -5, 1, 0],
    [0, 1, -2, 4, 63, -3, 1, 0]], np.int64)


def round_affine(vx: int, vy: int, shift: int):
    """roundAffineMv (Mv.cpp:47)."""
    off = 1 << (shift - 1)
    return ((vx + off - (1 if vx >= 0 else 0)) >> shift,
            (vy + off - (1 if vy >= 0 else 0)) >> shift)


def _round_affine_arr(v, shift):
    off = 1 << (shift - 1)
    return (v + off - (v >= 0)) >> shift


def _clip_storage_arr(v):
    return np.clip(v, _MV_MIN, _MV_MAX)


def model_deltas(cpmv, w: int, h: int, affine_type: int):
    """Per-sample MV deltas (a, b, c, d) = (dHorX, dHorY, dVerX, dVerY)
    at << _IBIT precision (xPredAffineBlk / setAllAffineMv common
    prologue)."""
    lt, rt, lb = cpmv[0], cpmv[1], cpmv[2]
    sw = _IBIT - (w.bit_length() - 1)
    a = (rt[0] - lt[0]) << sw
    b = (rt[1] - lt[1]) << sw
    if affine_type == 1:
        sh = _IBIT - (h.bit_length() - 1)
        c = (lb[0] - lt[0]) << sh
        d = (lb[1] - lt[1]) << sh
    else:
        c, d = -b, a
    return a, b, c, d


def spread_over_limit(a: int, b: int, c: int, d: int,
                      inter_dir: int) -> bool:
    """isSubblockVectorSpreadOverLimit (InterPrediction.cpp:813)."""
    s4 = 4 << 11
    tap = 6
    if inter_dir == 3:
        rw = (max(0, 4 * a + s4, 4 * c, 4 * a + 4 * c + s4)
              - min(0, 4 * a + s4, 4 * c, 4 * a + 4 * c + s4))
        rh = (max(0, 4 * b, 4 * d + s4, 4 * b + 4 * d + s4)
              - min(0, 4 * b, 4 * d + s4, 4 * b + 4 * d + s4))
        rw = (rw >> 11) + tap + 3
        rh = (rh >> 11) + tap + 3
        return rw * rh > (tap + 9) * (tap + 9)
    rw = max(0, 4 * a + s4) - min(0, 4 * a + s4)
    rh = max(0, 4 * b) - min(0, 4 * b)
    rw = (rw >> 11) + tap + 3
    rh = (rh >> 11) + tap + 3
    if rw * rh > (tap + 9) * (tap + 5):
        return True
    rw = max(0, 4 * c) - min(0, 4 * c)
    rh = max(0, 4 * d + s4) - min(0, 4 * d + s4)
    rw = (rw >> 11) + tap + 3
    rh = (rh >> 11) + tap + 3
    return rw * rh > (tap + 5) * (tap + 9)


def storage_mv_grid(cpmv, w: int, h: int, affine_type: int,
                    inter_dir: int) -> np.ndarray:
    """Per-4x4 subblock MVs (h//4, w//4, 2), exactly the values
    PU::setAllAffineMv spans into the motion field (and xPredAffineBlk
    stores in m_storedMv): center-sample evaluation, roundAffineMv,
    storage-bit-depth clip.  No picture clipping."""
    a, b, c, d = model_deltas(cpmv, w, h, affine_type)
    base_x = cpmv[0][0] << _IBIT
    base_y = cpmv[0][1] << _IBIT
    nw, nh = w // 4, h // 4
    if spread_over_limit(a, b, c, d, inter_dir):
        hx = base_x + a * (w >> 1) + c * (h >> 1)
        hy = base_y + b * (w >> 1) + d * (h >> 1)
        hx, hy = round_affine(hx, hy, _MV_SHIFT)
        hx = max(_MV_MIN, min(_MV_MAX, hx))
        hy = max(_MV_MIN, min(_MV_MAX, hy))
        out = np.empty((nh, nw, 2), np.int64)
        out[..., 0] = hx
        out[..., 1] = hy
        return out
    xs = (np.arange(nw, dtype=np.int64) * 4 + 2)[None, :]
    ys = (np.arange(nh, dtype=np.int64) * 4 + 2)[:, None]
    mx = base_x + a * xs + c * ys
    my = base_y + b * xs + d * ys
    mx = _clip_storage_arr(_round_affine_arr(mx, _MV_SHIFT))
    my = _clip_storage_arr(_round_affine_arr(my, _MV_SHIFT))
    return np.stack([mx, my], axis=-1)


def _pic_clip_arr(grid, x, y, pic_w, pic_h, ctu_size):
    """clipMvInPic bounds from the PU position (xPredAffineBlk passes
    pu.lumaPos() for every subblock)."""
    off = 8
    sh = inter.MV_FRAC_BITS
    hor_max = (pic_w + off - x - 1) << sh
    hor_min = (-ctu_size - off - x + 1) << sh
    ver_max = (pic_h + off - y - 1) << sh
    ver_min = (-ctu_size - off - y + 1) << sh
    out = grid.copy()
    out[..., 0] = np.clip(grid[..., 0], hor_min, hor_max)
    out[..., 1] = np.clip(grid[..., 1], ver_min, ver_max)
    return out


def prof_enabled(cpmv, affine_type: int, a, b, c, d,
                 inter_dir: int) -> bool:
    """Normative (decoder-side, m_encOnly false) PROF gating
    (InterPrediction.cpp:924-929), minus the SPS flag which the caller
    checks."""
    if affine_type == 1:
        if cpmv[0] == cpmv[1] and cpmv[0] == cpmv[2]:
            return False
    else:
        if cpmv[0] == cpmv[1]:
            return False
    return not spread_over_limit(a, b, c, d, inter_dir)


def _prof_dmv(a, b, c, d):
    """Per-sample dMv arrays for one 4x4 subblock (identical for every
    subblock of the CU; InterPrediction.cpp:955-1000). Returns
    (dmv_x, dmv_y) int64 (4, 4), rounded by 8 and clipped to +-31."""
    qx_x, qx_y = a << 2, b << 2
    qv_x, qv_y = c << 2, d << 2
    h0_x = ((a + c) << 1) - ((qx_x + qv_x) << 1)
    h0_y = ((b + d) << 1) - ((qx_y + qv_y) << 1)
    xs = np.arange(4, dtype=np.int64)
    dmv_x = h0_x + qx_x * xs[None, :] + qv_x * xs[:, None]
    dmv_y = h0_y + qx_y * xs[None, :] + qv_y * xs[:, None]
    dmv_x = np.clip(_round_affine_arr(dmv_x, 8), -31, 31)
    dmv_y = np.clip(_round_affine_arr(dmv_y, 8), -31, 31)
    return dmv_x, dmv_y


def mc_luma(ref: np.ndarray, x: int, y: int, w: int, h: int, cpmv,
            affine_type: int, inter_dir: int, bi: bool,
            bit_depth: int, pic_w: int, pic_h: int, ctu_size: int,
            use_prof: bool):
    """Affine luma MC (xPredAffineBlk, COMPONENT_Y): per-4x4 subblock
    translational MC with the 6-tap 4x4 filter, plus PROF.

    Returns (pred, grid): pred is (h, w) int32 — pel domain if not bi,
    else the 14-bit intermediate domain; grid is the storage MV grid
    (pre picture-clip) for chroma MC and motion-field spanning.
    """
    grid = storage_mv_grid(cpmv, w, h, affine_type, inter_dir)
    a, b, c, d = model_deltas(cpmv, w, h, affine_type)
    prof = use_prof and prof_enabled(cpmv, affine_type, a, b, c, d,
                                     inter_dir)
    mvc = _pic_clip_arr(grid, x, y, pic_w, pic_h, ctu_size)
    nh, nw = h // 4, w // 4
    n = nh * nw
    mvx = mvc[..., 0].reshape(n)
    mvy = mvc[..., 1].reshape(n)
    sh = inter.MV_FRAC_BITS
    bx = x + (np.arange(nw, dtype=np.int64) * 4)[None, :]
    by = y + (np.arange(nh, dtype=np.int64) * 4)[:, None]
    ix = (np.broadcast_to(bx, (nh, nw)).reshape(n) + (mvx >> sh))
    iy = (np.broadcast_to(by, (nh, nw)).reshape(n) + (mvy >> sh))
    fx = (mvx & 15).astype(np.int64)
    fy = (mvy & 15).astype(np.int64)

    H, W = ref.shape
    # batched 11x11 windows at (iy-3, ix-3), border-clamped
    ys = np.clip(iy[:, None] + np.arange(-3, 8)[None, :], 0, H - 1)
    xs = np.clip(ix[:, None] + np.arange(-3, 8)[None, :], 0, W - 1)
    win = ref[ys[:, :, None], xs[:, None, :]].astype(np.int64)

    head_room = inter.IF_INTERNAL_PREC - bit_depth
    shift1 = inter.IF_FILTER_PREC - head_room
    off1 = -inter.IF_INTERNAL_OFFS << shift1
    fxc = LUMA_FILTER_4x4[fx]               # (n, 8)
    fyc = LUMA_FILTER_4x4[fy]
    # horizontal pass on all 11 rows -> (n, 11, 4)
    sw = np.lib.stride_tricks.sliding_window_view(win, 8, axis=2)
    tmp = np.einsum('nrck,nk->nrc', sw, fxc)
    tmp = (tmp + off1) >> shift1
    # vertical pass -> (n, 4, 4) intermediate domain
    # (sliding_window_view puts the window axis last: (n, row, col, tap))
    sv = np.lib.stride_tricks.sliding_window_view(tmp, 8, axis=1)
    acc = np.einsum('nrck,nk->nrc', sv, fyc)
    interm = (acc >> inter.IF_FILTER_PREC).astype(np.int64)

    if prof:
        dmv_x, dmv_y = _prof_dmv(a, b, c, d)
        # integer ref ring at (iy + (fy>>3) - 1, ix + (fx>>3) - 1), 6x6
        ry = np.clip((iy + (fy >> 3))[:, None] + np.arange(-1, 5)[None],
                     0, H - 1)
        rx = np.clip((ix + (fx >> 3))[:, None] + np.arange(-1, 5)[None],
                     0, W - 1)
        ring = ref[ry[:, :, None], rx[:, None, :]].astype(np.int64)
        ring = (ring << head_room) - inter.IF_INTERNAL_OFFS
        ext = ring.copy()
        ext[:, 1:5, 1:5] = interm
        gx = (ext[:, 1:5, 2:6] >> 6) - (ext[:, 1:5, 0:4] >> 6)
        gy = (ext[:, 2:6, 1:5] >> 6) - (ext[:, 0:4, 1:5] >> 6)
        lim = 1 << max(bit_depth + 1, 13)
        di = np.clip(dmv_x[None] * gx + dmv_y[None] * gy,
                     -lim, lim - 1)
        interm = interm + di

    if bi:
        out = interm.astype(np.int32)
    else:
        shift = max(2, inter.IF_INTERNAL_PREC - bit_depth)
        offs = (1 << (shift - 1)) + inter.IF_INTERNAL_OFFS
        out = np.clip((interm + offs) >> shift, 0,
                      (1 << bit_depth) - 1).astype(np.int32)
    pred = out.reshape(nh, nw, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(h, w)
    return pred, grid


def mc_chroma(refc: np.ndarray, x: int, y: int, w: int, h: int,
              grid: np.ndarray, bi: bool, bit_depth: int,
              pic_w: int, pic_h: int, ctu_size: int) -> np.ndarray:
    """Affine chroma MC (4:2:0): per chroma-4x4 block, MV = rounded
    average of the two diagonal luma subblock MVs
    (InterPrediction.cpp:1110), picture-clipped with the PU's luma
    position, then the regular 4-tap chroma interpolation.

    x, y, w, h are LUMA coordinates of the CU; returns (h//2, w//2)."""
    mv = grid[0::2, 0::2].astype(np.int64) + grid[1::2, 1::2]
    mv = _round_affine_arr(mv, 1)
    mv = _pic_clip_arr(mv, x, y, pic_w, pic_h, ctu_size)
    nch, ncw = mv.shape[0], mv.shape[1]
    n = nch * ncw
    mvx = mv[..., 0].reshape(n)
    mvy = mv[..., 1].reshape(n)
    cx = x // 2 + (np.arange(ncw, dtype=np.int64) * 4)[None, :]
    cy = y // 2 + (np.arange(nch, dtype=np.int64) * 4)[:, None]
    ix = np.broadcast_to(cx, (nch, ncw)).reshape(n) + (mvx >> 5)
    iy = np.broadcast_to(cy, (nch, ncw)).reshape(n) + (mvy >> 5)
    fx = (mvx & 31).astype(np.int64)
    fy = (mvy & 31).astype(np.int64)

    H, W = refc.shape
    ys = np.clip(iy[:, None] + np.arange(-1, 6)[None, :], 0, H - 1)
    xs = np.clip(ix[:, None] + np.arange(-1, 6)[None, :], 0, W - 1)
    win = refc[ys[:, :, None], xs[:, None, :]].astype(np.int64)

    head_room = inter.IF_INTERNAL_PREC - bit_depth
    shift1 = inter.IF_FILTER_PREC - head_room
    off1 = -inter.IF_INTERNAL_OFFS << shift1
    fxc = inter.CHROMA_FILTER[fx].astype(np.int64)
    fyc = inter.CHROMA_FILTER[fy].astype(np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(win, 4, axis=2)
    tmp = np.einsum('nrck,nk->nrc', sw, fxc)
    tmp = (tmp + off1) >> shift1
    sv = np.lib.stride_tricks.sliding_window_view(tmp, 4, axis=1)
    acc = np.einsum('nrck,nk->nrc', sv, fyc)
    interm = acc >> inter.IF_FILTER_PREC

    if bi:
        out = interm.astype(np.int32)
    else:
        shift = inter.IF_FILTER_PREC + head_room
        # single final pass parity: two-pass isLast applies
        # shift2/off2 on the *second* filter; our tmp already divided
        # by shift1 — redo exact: final = (acc + off2') >> shift2'
        # with shift2' = IF_FILTER_PREC + head_room applied to acc
        # BEFORE the intermediate >> — recompute from acc:
        off2 = ((1 << (shift - 1))
                + (inter.IF_INTERNAL_OFFS << inter.IF_FILTER_PREC))
        out = np.clip((acc + off2) >> shift, 0,
                      (1 << bit_depth) - 1).astype(np.int32)
    return out.reshape(nch, ncw, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(nch * 4, ncw * 4)


# ---------------------------------------------------------------------
# CPMV candidate math

def inherited_cpmv(nb_x0: int, nb_y0: int, nb_w: int, nb_h: int,
                   nb_cpmv, nb_type: int, cur_x: int, cur_y: int,
                   cur_w: int, cur_h: int, cur_type: int,
                   ctu_size: int, bottom_mvs=None):
    """PU::xInheritedAffineMv (UnitTools.cpp:1994): extrapolate the
    neighbour's CPMVs to the current CU's corners.

    bottom_mvs: (mv_lb, mv_rb) motion-field MVs at the neighbour's
    bottom-left/bottom-right 4x4 when the neighbour sits in the CTU row
    above (line-buffer inheritance); pass None otherwise."""
    lt, rt, lb = nb_cpmv[0], nb_cpmv[1], nb_cpmv[2]
    pos_nx, pos_ny = nb_x0, nb_y0
    top_ctu = (bottom_mvs is not None)
    if top_ctu:
        lt, rt = bottom_mvs
        pos_ny += nb_h
    sw = _IBIT - (nb_w.bit_length() - 1)
    a = (rt[0] - lt[0]) << sw
    b = (rt[1] - lt[1]) << sw
    if nb_type == 1 and not top_ctu:
        sh = _IBIT - (nb_h.bit_length() - 1)
        c = (lb[0] - lt[0]) << sh
        d = (lb[1] - lt[1]) << sh
    else:
        c, d = -b, a
    base_x = lt[0] << _IBIT
    base_y = lt[1] << _IBIT

    def corner(px, py):
        hx = base_x + a * (px - pos_nx) + c * (py - pos_ny)
        hy = base_y + b * (px - pos_nx) + d * (py - pos_ny)
        hx, hy = round_affine(hx, hy, _IBIT)
        return (max(_MV_MIN, min(_MV_MAX, hx)),
                max(_MV_MIN, min(_MV_MAX, hy)))

    v0 = corner(cur_x, cur_y)
    v1 = corner(cur_x + cur_w, cur_y)
    v2 = corner(cur_x, cur_y + cur_h) if cur_type == 1 else (0, 0)
    return (v0, v1, v2)


def constructed_cpmv(model_idx: int, cmv, cur_w: int, cur_h: int):
    """PU::getAffineControlPointCand corner conversion
    (UnitTools.cpp:2427-2462) for one list.  cmv: dict corner-> (x,y)
    with keys present for the model's corners (0 LT, 1 RT, 2 LB,
    3 RB).  Returns (lt, rt, lb)."""
    c = dict(cmv)
    if model_idx == 1:          # LT, RT, RB -> LB
        c[2] = _cs(c[3][0] + c[0][0] - c[1][0],
                   c[3][1] + c[0][1] - c[1][1])
    elif model_idx == 2:        # LT, LB, RB -> RT
        c[1] = _cs(c[3][0] + c[0][0] - c[2][0],
                   c[3][1] + c[0][1] - c[2][1])
    elif model_idx == 3:        # RT, LB, RB -> LT
        c[0] = _cs(c[1][0] + c[2][0] - c[3][0],
                   c[1][1] + c[2][1] - c[3][1])
    elif model_idx == 5:        # LT, LB -> RT (rotate)
        shift = _IBIT
        sh2w = shift + (cur_w.bit_length() - 1) \
            - (cur_h.bit_length() - 1)
        vx = (c[0][0] << shift) + ((c[2][1] - c[0][1]) << sh2w)
        vy = (c[0][1] << shift) - ((c[2][0] - c[0][0]) << sh2w)
        vx, vy = round_affine(vx, vy, shift)
        c[1] = _cs(vx, vy)
    lt = c.get(0, (0, 0))
    rt = c.get(1, (0, 0))
    lb = c.get(2, (0, 0))
    return (lt, rt, lb)


def _cs(x, y):
    return (max(_MV_MIN, min(_MV_MAX, x)),
            max(_MV_MIN, min(_MV_MAX, y)))


def round_cpmv_quarter(cpmv):
    """roundAffinePrecInternal2Amvr(imv=0): snap each CPMV to the
    quarter-pel grid (still internal units)."""
    return tuple((inter.mv_round_to_quarter(v[0]),
                  inter.mv_round_to_quarter(v[1])) for v in cpmv)
