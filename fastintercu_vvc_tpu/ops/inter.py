"""Inter prediction: motion compensation (normative §8.5.6), MV
precision utilities, AMVP candidate derivation, HMVP.

Behavioral parity:
  - MC filters: CommonLib/InterpolationFilter.cpp m_lumaFilter (16-phase
    8-tap), m_chromaFilter (32-phase 4-tap); filter core shifts
    (InterpolationFilter.cpp::filter — IF_INTERNAL_PREC 14,
    IF_FILTER_PREC 6, internal offset 8192)
  - MV precision: Mv.h changePrecision/divideByPowerOf2 (internal 1/16,
    signalling 1/4 for imv=0)
  - AMVP: UnitTools.cpp PU::fillMvpCand (:~1490), addMVPCandUnscaled,
    addAMVPHMVPCand; HMVP: CodingStructure::addMiToLut (:952),
    CU::saveMotionInHMVP (:344)

Reference-picture access uses border clamping (VTM extends picture
borders by padding; equivalent gather-with-clamp here).

numpy scalar-exact implementation; the batched JAX/Pallas MC kernel for
the ME hot loop mirrors this math.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# 8-tap 16-phase luma MC filter (spec Table 28)
LUMA_FILTER = np.asarray([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [0, 1, -3, 63, 4, -2, 1, 0],
    [-1, 2, -5, 62, 8, -3, 1, 0],
    [-1, 3, -8, 60, 13, -4, 1, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 52, 26, -8, 3, -1],
    [-1, 3, -9, 47, 31, -10, 4, -1],
    [-1, 4, -11, 45, 34, -10, 4, -1],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [-1, 4, -10, 34, 45, -11, 4, -1],
    [-1, 4, -10, 31, 47, -9, 3, -1],
    [-1, 3, -8, 26, 52, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
    [0, 1, -4, 13, 60, -8, 3, -1],
    [0, 1, -3, 8, 62, -5, 2, -1],
    [0, 1, -2, 4, 63, -3, 1, 0]], np.int32)

IF_INTERNAL_PREC = 14
IF_FILTER_PREC = 6
IF_INTERNAL_OFFS = 1 << (IF_INTERNAL_PREC - 1)

MV_FRAC_BITS = 4          # internal 1/16-pel
AMVP_MAX_NUM_CANDS = 2
MAX_NUM_HMVP_CANDS = 5    # MRG_MAX_NUM_CANDS - 1
MAX_NUM_HMVP_AMVP_CANDS = 4


# ---------------------------------------------------------------------------
# MV precision (Mv.h parity)

def mv_round_to_quarter(v: int) -> int:
    """roundTransPrecInternal2Amvr(imv=0): internal -> quarter -> internal."""
    return _div_pow2(v, 2) << 2


def mv_internal_to_quarter(v: int) -> int:
    """changeTransPrecInternal2Amvr(0): internal(1/16) -> quarter."""
    return _div_pow2(v, 2)


def mv_quarter_to_internal(v: int) -> int:
    return v << 2


# AMVR: internal-precision shift per imv mode (Mv.h
# changeTransPrecInternal2Amvr): 0=quarter, 1=integer, 2=four-pel,
# 3=half-pel
AMVR_SHIFT = (2, 4, 6, 3)


def mv_round_to_amvr(v: int, imv: int) -> int:
    """roundTransPrecInternal2Amvr: round an internal MV component to
    the imv grid (still internal precision)."""
    s = AMVR_SHIFT[imv]
    return _div_pow2(v, s) << s


def mv_internal_to_amvr(v: int, imv: int) -> int:
    """changeTransPrecInternal2Amvr: internal -> signalling units."""
    return _div_pow2(v, AMVR_SHIFT[imv])


def _div_pow2(v: int, i: int) -> int:
    """Mv::divideByPowerOf2 rounding."""
    if i == 0:
        return v
    offset = 1 << (i - 1)
    return (v + offset - (1 if v >= 0 else 0)) >> i


# ---------------------------------------------------------------------------
# Motion compensation

def _gather_clamped(plane: np.ndarray, x0: int, y0: int, w: int, h: int):
    """Read a w x h window at (x0, y0) with border clamping."""
    H, W = plane.shape
    xs = np.clip(np.arange(x0, x0 + w), 0, W - 1)
    ys = np.clip(np.arange(y0, y0 + h), 0, H - 1)
    return plane[np.ix_(ys, xs)].astype(np.int64)


def mc_luma(ref: np.ndarray, x: int, y: int, w: int, h: int,
            mv_internal: tuple[int, int], bit_depth: int = 10) -> np.ndarray:
    """Luma MC for a block at (x, y) with an internal-precision (1/16)
    MV. Uni-prediction output in pel domain (clipped).

    Parity: InterPrediction::xPredInterBlk -> InterpolationFilter
    filterHor(isFirst, !isLast) + filterVer(!isFirst, isLast) shifts.
    """
    mvx, mvy = mv_internal
    int_x = x + (mvx >> MV_FRAC_BITS)
    int_y = y + (mvy >> MV_FRAC_BITS)
    frac_x = mvx & 15
    frac_y = mvy & 15
    head_room = IF_INTERNAL_PREC - bit_depth
    clip_hi = (1 << bit_depth) - 1

    if frac_x == 0 and frac_y == 0:
        return _gather_clamped(ref, int_x, int_y, w, h).astype(np.int32)

    if frac_y == 0:
        # horizontal only: single pass, isFirst=isLast=true
        win = _gather_clamped(ref, int_x - 3, int_y, w + 7, h)
        f = LUMA_FILTER[frac_x].astype(np.int64)
        acc = sum(f[i] * win[:, i:i + w] for i in range(8))
        out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
        return np.clip(out, 0, clip_hi).astype(np.int32)

    if frac_x == 0:
        win = _gather_clamped(ref, int_x, int_y - 3, w, h + 7)
        f = LUMA_FILTER[frac_y].astype(np.int64)
        acc = sum(f[i] * win[i:i + h, :] for i in range(8))
        out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
        return np.clip(out, 0, clip_hi).astype(np.int32)

    # separable: hor first (to internal precision), then ver (to pel)
    win = _gather_clamped(ref, int_x - 3, int_y - 3, w + 7, h + 7)
    fx = LUMA_FILTER[frac_x].astype(np.int64)
    shift1 = IF_FILTER_PREC - head_room
    off1 = -IF_INTERNAL_OFFS << shift1
    tmp = sum(fx[i] * win[:, i:i + w] for i in range(8))
    tmp = (tmp + off1) >> shift1

    fy = LUMA_FILTER[frac_y].astype(np.int64)
    shift2 = IF_FILTER_PREC + head_room
    off2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
    acc = sum(fy[i] * tmp[i:i + h, :] for i in range(8))
    out = (acc + off2) >> shift2
    return np.clip(out, 0, clip_hi).astype(np.int32)


def _leftshift_round(x, shift):
    return x << shift if shift >= 0 else (x + (1 << (-shift - 1))) >> -shift


def mc_luma_intermediate(ref: np.ndarray, x: int, y: int, w: int, h: int,
                         mv_internal, bit_depth: int = 10) -> np.ndarray:
    """Luma MC to the 14-bit intermediate domain (for bi-prediction;
    InterpolationFilter isLast=false paths + filterCopy isFirst branch)."""
    mvx, mvy = mv_internal
    int_x = x + (mvx >> MV_FRAC_BITS)
    int_y = y + (mvy >> MV_FRAC_BITS)
    frac_x = mvx & 15
    frac_y = mvy & 15
    head_room = IF_INTERNAL_PREC - bit_depth

    if frac_x == 0 and frac_y == 0:
        win = _gather_clamped(ref, int_x, int_y, w, h)
        return (_leftshift_round(win, head_room) - IF_INTERNAL_OFFS
                ).astype(np.int32)
    shift1 = IF_FILTER_PREC - head_room
    off1 = -IF_INTERNAL_OFFS << shift1
    if frac_y == 0:
        win = _gather_clamped(ref, int_x - 3, int_y, w + 7, h)
        f = LUMA_FILTER[frac_x].astype(np.int64)
        acc = sum(f[i] * win[:, i:i + w] for i in range(8))
        return ((acc + off1) >> shift1).astype(np.int32)
    if frac_x == 0:
        win = _gather_clamped(ref, int_x, int_y - 3, w, h + 7)
        f = LUMA_FILTER[frac_y].astype(np.int64)
        acc = sum(f[i] * win[i:i + h, :] for i in range(8))
        return ((acc + off1) >> shift1).astype(np.int32)
    win = _gather_clamped(ref, int_x - 3, int_y - 3, w + 7, h + 7)
    fx = LUMA_FILTER[frac_x].astype(np.int64)
    tmp = sum(fx[i] * win[:, i:i + w] for i in range(8))
    tmp = (tmp + off1) >> shift1
    fy = LUMA_FILTER[frac_y].astype(np.int64)
    acc = sum(fy[i] * tmp[i:i + h, :] for i in range(8))
    return (acc >> IF_FILTER_PREC).astype(np.int32)


def mc_chroma_intermediate(ref: np.ndarray, xc: int, yc: int, w: int,
                           h: int, mv_internal,
                           bit_depth: int = 10) -> np.ndarray:
    """Chroma MC to the intermediate domain (bi-prediction)."""
    mvx, mvy = mv_internal
    int_x = xc + (mvx >> 5)
    int_y = yc + (mvy >> 5)
    frac_x = mvx & 31
    frac_y = mvy & 31
    head_room = IF_INTERNAL_PREC - bit_depth

    if frac_x == 0 and frac_y == 0:
        win = _gather_clamped(ref, int_x, int_y, w, h)
        return (_leftshift_round(win, head_room) - IF_INTERNAL_OFFS
                ).astype(np.int32)
    shift1 = IF_FILTER_PREC - head_room
    off1 = -IF_INTERNAL_OFFS << shift1
    if frac_y == 0:
        win = _gather_clamped(ref, int_x - 1, int_y, w + 3, h)
        f = CHROMA_FILTER[frac_x].astype(np.int64)
        acc = sum(f[i] * win[:, i:i + w] for i in range(4))
        return ((acc + off1) >> shift1).astype(np.int32)
    if frac_x == 0:
        win = _gather_clamped(ref, int_x, int_y - 1, w, h + 3)
        f = CHROMA_FILTER[frac_y].astype(np.int64)
        acc = sum(f[i] * win[i:i + h, :] for i in range(4))
        return ((acc + off1) >> shift1).astype(np.int32)
    win = _gather_clamped(ref, int_x - 1, int_y - 1, w + 3, h + 3)
    fx = CHROMA_FILTER[frac_x].astype(np.int64)
    tmp = sum(fx[i] * win[:, i:i + w] for i in range(4))
    tmp = (tmp + off1) >> shift1
    fy = CHROMA_FILTER[frac_y].astype(np.int64)
    acc = sum(fy[i] * tmp[i:i + h, :] for i in range(4))
    return (acc >> IF_FILTER_PREC).astype(np.int32)


# ---------------------------------------------------------------------------
# DMVR (decoder-side MV refinement) — InterPrediction::xProcessDMVR
# (InterPrediction.cpp:1999), xinitMC (:1948), xBIPMVRefine (:1822),
# xDMVRSubPixelErrorSurface (:1925), xFinalPaddedMCForDMVR (:1847),
# bilinear filter InterpolationFilter.cpp m_bilinearFilterPrec4 (:312)
# + biMCForDMVR shift rules (:590), condition PU::checkDMVRCondition.

DMVR_ITER = 2            # DMVR_NUM_ITERATION (search range +-2)
DMVR_SUBCU = 16
IF_PREC_BILINEAR = 10    # IF_INTERNAL_PREC_BILINEAR
IF_FILTER_PREC_BILINEAR = 4

# raster-order 5x5 search offsets (InterPrediction.h:95) — order is
# normative for tie-breaking (strict '<' keeps the first minimum)
_DMVR_OFFSETS = [(dx_, dy_) for dy_ in range(-2, 3)
                 for dx_ in range(-2, 3)]

_BILINEAR_FILTER = np.asarray([[16 - i, i] for i in range(16)], np.int64)


def clip_mv_pic(mv, x, y, pic_w, pic_h, ctu_size):
    """clipMvInPic (Mv.cpp:56) for an internal-precision MV at luma
    position (x, y)."""
    off = 8
    hor_max = (pic_w + off - x - 1) << MV_FRAC_BITS
    hor_min = (-ctu_size - off - x + 1) << MV_FRAC_BITS
    ver_max = (pic_h + off - y - 1) << MV_FRAC_BITS
    ver_min = (-ctu_size - off - y + 1) << MV_FRAC_BITS
    return (min(hor_max, max(hor_min, mv[0])),
            min(ver_max, max(ver_min, mv[1])))


def _bilinear_dmvr(ref, x, y, w, h, mv, bd):
    """(h, w) bilinear prediction in the 10-bit DMVR domain
    (xPredInterBlk with bilinearMC=true; 2-tap prec-4 filter)."""
    mvx, mvy = mv
    int_x = x + (mvx >> MV_FRAC_BITS)
    int_y = y + (mvy >> MV_FRAC_BITS)
    fx = mvx & 15
    fy = mvy & 15
    shift_first = IF_FILTER_PREC_BILINEAR - (IF_PREC_BILINEAR - bd)

    def first_pass(acc):
        if shift_first > 0:
            return (acc + (1 << (shift_first - 1))) >> shift_first
        return acc << -shift_first

    if fx == 0 and fy == 0:
        win = _gather_clamped(ref, int_x, int_y, w, h)
        if bd > IF_PREC_BILINEAR:
            s = bd - IF_PREC_BILINEAR
            return ((win + (1 << (s - 1))) >> s).astype(np.int32)
        return (win << (IF_PREC_BILINEAR - bd)).astype(np.int32)
    if fy == 0:
        win = _gather_clamped(ref, int_x, int_y, w + 1, h)
        f = _BILINEAR_FILTER[fx]
        acc = f[0] * win[:, :w] + f[1] * win[:, 1:w + 1]
        return first_pass(acc).astype(np.int32)
    if fx == 0:
        win = _gather_clamped(ref, int_x, int_y, w, h + 1)
        f = _BILINEAR_FILTER[fy]
        acc = f[0] * win[:h, :] + f[1] * win[1:h + 1, :]
        return first_pass(acc).astype(np.int32)
    win = _gather_clamped(ref, int_x, int_y, w + 1, h + 1)
    f = _BILINEAR_FILTER[fx]
    tmp = first_pass(f[0] * win[:, :w] + f[1] * win[:, 1:w + 1])
    f = _BILINEAR_FILTER[fy]
    acc = f[0] * tmp[:h, :] + f[1] * tmp[1:h + 1, :]
    return ((acc + 8) >> 4).astype(np.int32)


def _dmvr_sad(a, b):
    """xDMVRCost: SAD over every other row (subShift 1), <<1 then >>1."""
    return int(np.abs(a[::2].astype(np.int64) - b[::2]).sum())


def _div_for_maxq7(n, d):
    """div_for_maxq7 (InterPrediction.cpp:1733): 3-bit quotient in
    eighths."""
    sign = n < 0
    if sign:
        n = -n
    q = 0
    d = d << 3
    if n >= d:
        n -= d
        q += 1
    q <<= 1
    d >>= 1
    if n >= d:
        n -= d
        q += 1
    q <<= 1
    if n >= (d >> 1):
        q += 1
    return -q if sign else q


def _subpel_error_srfc(sad):
    """xSubPelErrorSrfc: parametric 1/16-pel offset from the 5-point
    cost cross [center, left, above, right, below]."""
    out = [0, 0]
    for k, (m, p) in enumerate(((1, 3), (2, 4))):
        num = (sad[m] - sad[p]) << 4
        den = sad[m] + sad[p] - (sad[0] << 1)
        if den != 0:
            if sad[m] != sad[0] and sad[p] != sad[0]:
                out[k] = _div_for_maxq7(num, den)
            else:
                out[k] = -8 if sad[m] == sad[0] else 8
    return out


def _mc_win_luma(win, sy, sx, w, h, fx, fy, bd, to_pel):
    """8-tap luma MC reading from an explicit (padded) sample window;
    block start sample at win[sy, sx].  to_pel: final rounding+clip
    (uni) vs intermediate domain (bi)."""
    head_room = IF_INTERNAL_PREC - bd
    win = win.astype(np.int64)
    if fx == 0 and fy == 0:
        blk = win[sy:sy + h, sx:sx + w]
        if to_pel:
            return blk.astype(np.int32)
        return (_leftshift_round(blk, head_room) - IF_INTERNAL_OFFS
                ).astype(np.int32)
    clip_hi = (1 << bd) - 1
    if fy == 0:
        src = win[sy:sy + h, sx - 3:sx + w + 4]
        f = LUMA_FILTER[fx].astype(np.int64)
        acc = sum(f[i] * src[:, i:i + w] for i in range(8))
        if to_pel:
            out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
            return np.clip(out, 0, clip_hi).astype(np.int32)
        s1 = IF_FILTER_PREC - head_room
        return ((acc + (-IF_INTERNAL_OFFS << s1)) >> s1).astype(np.int32)
    if fx == 0:
        src = win[sy - 3:sy + h + 4, sx:sx + w]
        f = LUMA_FILTER[fy].astype(np.int64)
        acc = sum(f[i] * src[i:i + h, :] for i in range(8))
        if to_pel:
            out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
            return np.clip(out, 0, clip_hi).astype(np.int32)
        s1 = IF_FILTER_PREC - head_room
        return ((acc + (-IF_INTERNAL_OFFS << s1)) >> s1).astype(np.int32)
    src = win[sy - 3:sy + h + 4, sx - 3:sx + w + 4]
    fxc = LUMA_FILTER[fx].astype(np.int64)
    s1 = IF_FILTER_PREC - head_room
    tmp = sum(fxc[i] * src[:, i:i + w] for i in range(8))
    tmp = (tmp + (-IF_INTERNAL_OFFS << s1)) >> s1
    fyc = LUMA_FILTER[fy].astype(np.int64)
    acc = sum(fyc[i] * tmp[i:i + h, :] for i in range(8))
    if to_pel:
        s2 = IF_FILTER_PREC + head_room
        off2 = (1 << (s2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
        return np.clip((acc + off2) >> s2, 0, clip_hi).astype(np.int32)
    return (acc >> IF_FILTER_PREC).astype(np.int32)


def _mc_win_chroma(win, sy, sx, w, h, fx, fy, bd, to_pel):
    """4-tap chroma MC from an explicit window (block start at
    win[sy, sx])."""
    head_room = IF_INTERNAL_PREC - bd
    win = win.astype(np.int64)
    if fx == 0 and fy == 0:
        blk = win[sy:sy + h, sx:sx + w]
        if to_pel:
            return blk.astype(np.int32)
        return (_leftshift_round(blk, head_room) - IF_INTERNAL_OFFS
                ).astype(np.int32)
    clip_hi = (1 << bd) - 1
    s1 = IF_FILTER_PREC - head_room
    off1 = -IF_INTERNAL_OFFS << s1
    if fy == 0:
        src = win[sy:sy + h, sx - 1:sx + w + 2]
        f = CHROMA_FILTER[fx].astype(np.int64)
        acc = sum(f[i] * src[:, i:i + w] for i in range(4))
        if to_pel:
            out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
            return np.clip(out, 0, clip_hi).astype(np.int32)
        return ((acc + off1) >> s1).astype(np.int32)
    if fx == 0:
        src = win[sy - 1:sy + h + 2, sx:sx + w]
        f = CHROMA_FILTER[fy].astype(np.int64)
        acc = sum(f[i] * src[i:i + h, :] for i in range(4))
        if to_pel:
            out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
            return np.clip(out, 0, clip_hi).astype(np.int32)
        return ((acc + off1) >> s1).astype(np.int32)
    src = win[sy - 1:sy + h + 2, sx - 1:sx + w + 2]
    fxc = CHROMA_FILTER[fx].astype(np.int64)
    tmp = sum(fxc[i] * src[:, i:i + w] for i in range(4))
    tmp = (tmp + off1) >> s1
    fyc = CHROMA_FILTER[fy].astype(np.int64)
    acc = sum(fyc[i] * tmp[i:i + h, :] for i in range(4))
    if to_pel:
        s2 = IF_FILTER_PREC + head_room
        off2 = (1 << (s2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
        return np.clip((acc + off2) >> s2, 0, clip_hi).astype(np.int32)
    return (acc >> IF_FILTER_PREC).astype(np.int32)


def dmvr_refine_luma(ref0, ref1, x, y, w, h, mv0, mv1, bd,
                     pic_w, pic_h, ctu_size, bdof_on):
    """Full DMVR for a luma PU: per-16x16-sub-PU +-2 integer search on
    bilinear predictions + parametric sub-pel, final padded 8-tap MC
    with the refined MVs (+ per-sub-PU BDOF when its SAD clears the
    threshold).  -> (pred [h, w] pel, deltas [ny, nx, 2] internal,
    moved [ny, nx] bool)."""
    dy_s = min(h, DMVR_SUBCU)
    dx_s = min(w, DMVR_SUBCU)
    ny, nx = h // dy_s, w // dx_s
    pred = np.zeros((h, w), np.int32)
    deltas = np.zeros((ny, nx, 2), np.int32)
    moved = np.zeros((ny, nx), bool)
    bio_thres = 2 * dx_s * dy_s
    for iy in range(ny):
        for ix in range(nx):
            sx_, sy_ = x + ix * dx_s, y + iy * dy_s
            cmv0 = clip_mv_pic(mv0, sx_, sy_, pic_w, pic_h, ctu_size)
            cmv1 = clip_mv_pic(mv1, sx_, sy_, pic_w, pic_h, ctu_size)
            bl0 = _bilinear_dmvr(ref0, sx_ - DMVR_ITER, sy_ - DMVR_ITER,
                                 dx_s + 4, dy_s + 4, cmv0, bd)
            bl1 = _bilinear_dmvr(ref1, sx_ - DMVR_ITER, sy_ - DMVR_ITER,
                                 dx_s + 4, dy_s + 4, cmv1, bd)
            sads = {}
            c0 = _dmvr_sad(bl0[2:2 + dy_s, 2:2 + dx_s],
                           bl1[2:2 + dy_s, 2:2 + dx_s])
            min_cost = c0 - (c0 >> 2)
            not_zero = True
            best = (0, 0)
            if min_cost < dx_s * dy_s or min_cost == 0:
                not_zero = False
            else:
                sads[(0, 0)] = min_cost
                for (ox, oy) in _DMVR_OFFSETS:
                    if (ox, oy) not in sads:
                        sads[(ox, oy)] = _dmvr_sad(
                            bl0[2 + oy:2 + oy + dy_s,
                                2 + ox:2 + ox + dx_s],
                            bl1[2 - oy:2 - oy + dy_s,
                                2 - ox:2 - ox + dx_s])
                    if sads[(ox, oy)] < min_cost:
                        min_cost = sads[(ox, oy)]
                        best = (ox, oy)
            bio_sub = bdof_on and (min_cost >= bio_thres)
            total = [best[0] << MV_FRAC_BITS, best[1] << MV_FRAC_BITS]
            if not_zero and abs(total[0]) != (2 << MV_FRAC_BITS) \
                    and abs(total[1]) != (2 << MV_FRAC_BITS):
                bx, by = best
                cross = [sads.get((bx, by)),
                         sads.get((bx - 1, by)), sads.get((bx, by - 1)),
                         sads.get((bx + 1, by)), sads.get((bx, by + 1))]
                if all(v is not None for v in cross):
                    sub = _subpel_error_srfc(cross)
                    total[0] += sub[0]
                    total[1] += sub[1]
            d = (int(total[0]), int(total[1]))
            deltas[iy, ix] = d
            moved[iy, ix] = d != (0, 0)
            pred[iy * dy_s:(iy + 1) * dy_s, ix * dx_s:(ix + 1) * dx_s] \
                = _dmvr_final_luma(ref0, ref1, sx_, sy_, dx_s, dy_s,
                                   mv0, mv1, d, bd, pic_w, pic_h,
                                   ctu_size, bio_sub)
    return pred, deltas, moved


def _dmvr_final_luma(ref0, ref1, sx_, sy_, dx_s, dy_s, mv0, mv1, d, bd,
                     pic_w, pic_h, ctu_size, bio_sub):
    """xFinalPaddedMCForDMVR luma: 8-tap MC at the refined MVs reading
    from the 2-padded prefetch window (replicated ring), then bi
    average or per-sub-PU BDOF."""
    ints = []
    exts = []
    for (ref, mv, sgn) in ((ref0, mv0, 1), (ref1, mv1, -1)):
        refined = (mv[0] + sgn * d[0], mv[1] + sgn * d[1])
        cref = clip_mv_pic(refined, sx_, sy_, pic_w, pic_h, ctu_size)
        # prefetch window: merge MV offset by -3 (filter extent), clip,
        # (dx+7, dy+7) real samples, padded by 2 with replication
        pmv = clip_mv_pic((mv[0] - (3 << MV_FRAC_BITS),
                           mv[1] - (3 << MV_FRAC_BITS)),
                          sx_, sy_, pic_w, pic_h, ctu_size)
        bx = sx_ + (pmv[0] >> MV_FRAC_BITS)
        by = sy_ + (pmv[1] >> MV_FRAC_BITS)
        win = np.asarray(_gather_clamped(ref, bx, by, dx_s + 7,
                                         dy_s + 7), np.int64)
        win = np.pad(win, DMVR_ITER, mode="edge")
        d_ix = ((mv[0] + sgn * d[0]) >> MV_FRAC_BITS) \
            - (mv[0] >> MV_FRAC_BITS)
        d_iy = ((mv[1] + sgn * d[1]) >> MV_FRAC_BITS) \
            - (mv[1] >> MV_FRAC_BITS)
        sy0 = DMVR_ITER + 3 + d_iy
        sx0 = DMVR_ITER + 3 + d_ix
        fx = cref[0] & 15
        fy = cref[1] & 15
        if bio_sub:
            # extended (h+2, w+2): interpolated inner + nearest-integer
            # ring from the padded window (xPredInterBlk bio fill with
            # srcPadBuf)
            inner = _mc_win_luma(win, sy0, sx0, dx_s, dy_s, fx, fy,
                                 bd, to_pel=False)
            ext = np.zeros((dy_s + 2, dx_s + 2), np.int32)
            ext[1:dy_s + 1, 1:dx_s + 1] = inner
            xo = 1 if fx < 8 else 0
            yo = 1 if fy < 8 else 0
            shift = IF_INTERNAL_PREC - bd
            ext[0, :] = (win[sy0 - yo, sx0 - xo:sx0 - xo + dx_s + 2]
                         << shift) - IF_INTERNAL_OFFS
            ext[dy_s + 1, :] = (win[sy0 + dy_s + 1 - yo,
                                    sx0 - xo:sx0 - xo + dx_s + 2]
                                << shift) - IF_INTERNAL_OFFS
            ext[1:dy_s + 1, 0] = (win[sy0 + 1 - yo:sy0 + 1 - yo + dy_s,
                                      sx0 - xo] << shift) \
                - IF_INTERNAL_OFFS
            ext[1:dy_s + 1, dx_s + 1] = (
                win[sy0 + 1 - yo:sy0 + 1 - yo + dy_s,
                    sx0 + dx_s + 1 - xo] << shift) - IF_INTERNAL_OFFS
            exts.append(ext)
        else:
            ints.append(_mc_win_luma(win, sy0, sx0, dx_s, dy_s, fx, fy,
                                     bd, to_pel=False))
    if bio_sub:
        return _bdof_core(exts[0], exts[1], dx_s, dy_s, bd)
    return bi_avg(ints[0], ints[1], bd)


def dmvr_pred_chroma(refc, xc, yc, wc, hc, mv, sgn_deltas, bd,
                     pic_w, pic_h, ctu_size, sub_w, sub_h, moved):
    """Chroma MC for one list of a DMVR CU: per-sub-PU refined MVs;
    moved sub-PUs read from the 1-padded prefetch window
    (xFinalPaddedMCForDMVR chroma path).  sgn_deltas: per-sub-PU
    internal-precision delta ALREADY sign-applied for this list.
    sub_w/sub_h are chroma sub-PU dims.  -> intermediate-domain pred."""
    ny, nx = sgn_deltas.shape[:2]
    out = np.zeros((hc, wc), np.int32)
    for iy in range(ny):
        for ix in range(nx):
            cx = xc + ix * sub_w
            cy = yc + iy * sub_h
            lx, ly = 2 * cx, 2 * cy
            d = (int(sgn_deltas[iy, ix, 0]), int(sgn_deltas[iy, ix, 1]))
            refined = (mv[0] + d[0], mv[1] + d[1])
            cref = clip_mv_pic(refined, lx, ly, pic_w, pic_h, ctu_size)
            if not moved[iy, ix]:
                out[iy * sub_h:(iy + 1) * sub_h,
                    ix * sub_w:(ix + 1) * sub_w] = \
                    mc_chroma_intermediate(refc, cx, cy, sub_w, sub_h,
                                           cref, bd)
                continue
            # prefetch: cMv offset by -1 chroma sample, luma-based clip
            pmv = clip_mv_pic((mv[0] - (1 << 5), mv[1] - (1 << 5)),
                              lx, ly, pic_w, pic_h, ctu_size)
            bx = cx + (pmv[0] >> 5)
            by = cy + (pmv[1] >> 5)
            win = np.asarray(_gather_clamped(refc, bx, by, sub_w + 3,
                                             sub_h + 3), np.int64)
            win = np.pad(win, 1, mode="edge")
            d_ix = (refined[0] >> 5) - (mv[0] >> 5)
            d_iy = (refined[1] >> 5) - (mv[1] >> 5)
            sy0 = 1 + 1 + d_iy
            sx0 = 1 + 1 + d_ix
            fx = cref[0] & 31
            fy = cref[1] & 31
            out[iy * sub_h:(iy + 1) * sub_h,
                ix * sub_w:(ix + 1) * sub_w] = _mc_win_chroma(
                    win, sy0, sx0, sub_w, sub_h, fx, fy, bd,
                    to_pel=False)
    return out


# ---------------------------------------------------------------------------
# BDOF (bi-directional optical flow) — InterPrediction::applyBiOptFlow
# (InterPrediction.cpp:1246), gradient kernels Buffer.cpp gradFilterCore
# (:114) / calcBIOSumsCore (:157) / addBIOAvgCore, integer-sample border
# fill xPredInterBlk (:743-822).  Processing blocks are
# min(w,16) x min(h,16) sub-PUs (xSubPuBio split at
# MAX_BDOF_APPLICATION_REGION=16), each with its own 1-sample border.

def _bdof_ext_pred(ref, x, y, w, h, mv, bd):
    """(h+2, w+2) extended internal-domain prediction: interpolated
    inner block, ring from nearest-integer reference samples."""
    mvx, mvy = mv
    int_x = x + (mvx >> MV_FRAC_BITS)
    int_y = y + (mvy >> MV_FRAC_BITS)
    frac_x = mvx & 15
    frac_y = mvy & 15
    xo = 1 if frac_x < 8 else 0
    yo = 1 if frac_y < 8 else 0
    shift = IF_INTERNAL_PREC - bd
    ext = np.zeros((h + 2, w + 2), np.int32)
    ext[1:h + 1, 1:w + 1] = mc_luma_intermediate(ref, x, y, w, h, mv, bd)
    top = _gather_clamped(ref, int_x - xo, int_y - yo, w + 2, 1)
    bot = _gather_clamped(ref, int_x - xo, int_y + h + 1 - yo, w + 2, 1)
    lft = _gather_clamped(ref, int_x - xo, int_y + 1 - yo, 1, h)
    rgt = _gather_clamped(ref, int_x + w + 1 - xo, int_y + 1 - yo, 1, h)
    ext[0, :] = (top[0] << shift) - IF_INTERNAL_OFFS
    ext[h + 1, :] = (bot[0] << shift) - IF_INTERNAL_OFFS
    ext[1:h + 1, 0] = (lft[:, 0] << shift) - IF_INTERNAL_OFFS
    ext[1:h + 1, w + 1] = (rgt[:, 0] << shift) - IF_INTERNAL_OFFS
    return ext


def _bdof_grads(ext, w, h):
    """BIO gradients over the extended grid (gradFilterCore: inner
    (src[+1]>>6)-(src[-1]>>6), ring replicated)."""
    gx = np.zeros_like(ext)
    gy = np.zeros_like(ext)
    gx[1:h + 1, 1:w + 1] = (ext[1:h + 1, 2:w + 2] >> 6) \
        - (ext[1:h + 1, 0:w] >> 6)
    gy[1:h + 1, 1:w + 1] = (ext[2:h + 2, 1:w + 1] >> 6) \
        - (ext[0:h, 1:w + 1] >> 6)
    for g in (gx, gy):
        g[1:h + 1, 0] = g[1:h + 1, 1]
        g[1:h + 1, w + 1] = g[1:h + 1, w]
        g[0, :] = g[1, :]
        g[h + 1, :] = g[h, :]
    return gx, gy


def _bdof_block(ref0, ref1, x, y, w, h, mv0, mv1, bd):
    """BDOF for one processing block (w, h <= 16); -> pel block."""
    e0 = _bdof_ext_pred(ref0, x, y, w, h, mv0, bd)
    e1 = _bdof_ext_pred(ref1, x, y, w, h, mv1, bd)
    return _bdof_core(e0, e1, w, h, bd)


def _bdof_core(e0, e1, w, h, bd):
    """applyBiOptFlow given the two extended predictions."""
    gx0, gy0 = _bdof_grads(e0, w, h)
    gx1, gy1 = _bdof_grads(e1, w, h)
    # src ring re-padded by replication from the inner block (the
    # integer-sample ring is only used for the gradients)
    for e in (e0, e1):
        e[1:h + 1, 0] = e[1:h + 1, 1]
        e[1:h + 1, w + 1] = e[1:h + 1, w]
        e[0, :] = e[1, :]
        e[h + 1, :] = e[h, :]

    shift_num = (IF_INTERNAL_PREC - bd) + 1
    offset = (1 << (shift_num - 1)) + 2 * IF_INTERNAL_OFFS
    limit = (1 << 4) - 1
    out = np.zeros((h, w), np.int32)
    for yu in range(h >> 2):
        for xu in range(w >> 2):
            sl = np.s_[yu * 4:yu * 4 + 6, xu * 4:xu * 4 + 6]
            tgx = (gx0[sl].astype(np.int64) + gx1[sl]) >> 1
            tgy = (gy0[sl].astype(np.int64) + gy1[sl]) >> 1
            tdi = (e1[sl].astype(np.int64) >> 4) - (e0[sl] >> 4)
            s_abs_gx = int(np.abs(tgx).sum())
            s_abs_gy = int(np.abs(tgy).sum())
            s_dix = int(np.where(tgx < 0, -tdi,
                                 np.where(tgx == 0, 0, tdi)).sum())
            s_diy = int(np.where(tgy < 0, -tdi,
                                 np.where(tgy == 0, 0, tdi)).sum())
            s_sgygx = int(np.where(tgy < 0, -tgx,
                                   np.where(tgy == 0, 0, tgx)).sum())
            if s_abs_gx == 0:
                tmpx = 0
            else:
                tmpx = (s_dix << 2) >> (s_abs_gx.bit_length() - 1)
                tmpx = min(limit, max(-limit, tmpx))
            mains = s_sgygx >> 12
            secs = s_sgygx & ((1 << 12) - 1)
            tmp_data = ((tmpx * mains << 12) + tmpx * secs) >> 1
            if s_abs_gy == 0:
                tmpy = 0
            else:
                tmpy = ((s_diy << 2) - tmp_data) \
                    >> (s_abs_gy.bit_length() - 1)
                tmpy = min(limit, max(-limit, tmpy))
            isl = np.s_[1 + yu * 4:1 + yu * 4 + 4,
                        1 + xu * 4:1 + xu * 4 + 4]
            b = (tmpx * (gx0[isl].astype(np.int64) - gx1[isl])
                 + tmpy * (gy0[isl].astype(np.int64) - gy1[isl]))
            val = (e0[isl].astype(np.int64) + e1[isl] + b + offset) \
                >> shift_num
            out[yu * 4:yu * 4 + 4, xu * 4:xu * 4 + 4] = \
                np.clip(val, 0, (1 << bd) - 1)
    return out


def bdof_bi_luma(ref0, ref1, x, y, w, h, mv0, mv1,
                 bit_depth: int = 10) -> np.ndarray:
    """Bi-prediction with BDOF refinement for a luma PU (the caller
    checks the application conditions; this handles the 16x16 sub-PU
    split)."""
    sw, sh = min(w, 16), min(h, 16)
    out = np.zeros((h, w), np.int32)
    for sy in range(0, h, sh):
        for sx in range(0, w, sw):
            out[sy:sy + sh, sx:sx + sw] = _bdof_block(
                ref0, ref1, x + sx, y + sy, sw, sh, mv0, mv1, bit_depth)
    return out


def bi_avg(a: np.ndarray, b: np.ndarray, bit_depth: int = 10) -> np.ndarray:
    """PelBuf::addAvg parity: average two intermediate-domain preds back
    to the pel domain (Buffer.cpp:447-458)."""
    shift_num = (IF_INTERNAL_PREC - bit_depth) + 1
    offset = (1 << (shift_num - 1)) + 2 * IF_INTERNAL_OFFS
    out = (a.astype(np.int64) + b.astype(np.int64) + offset) >> shift_num
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


def bcw_avg(a: np.ndarray, b: np.ndarray, bcw_idx: int,
            bit_depth: int = 10) -> np.ndarray:
    """PelBuf::addWeightedAvg parity (Buffer.cpp:350): BCW weighted
    average of two intermediate-domain preds; w1 = g_BcwWeights[idx],
    w0 = 8 - w1, shift = IF_INTERNAL_FRAC_BITS + 3."""
    if bcw_idx == BCW_DEFAULT:
        return bi_avg(a, b, bit_depth)
    w1 = BCW_WEIGHTS[bcw_idx]
    w0 = 8 - w1
    shift_num = (IF_INTERNAL_PREC - bit_depth) + 3
    offset = (1 << (shift_num - 1)) + (IF_INTERNAL_OFFS << 3)
    out = (a.astype(np.int64) * w0 + b.astype(np.int64) * w1
           + offset) >> shift_num
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


# ---------------------------------------------------------------------------
# Motion info maps + AMVP + HMVP

BCW_NUM = 5
BCW_DEFAULT = BCW_NUM >> 1          # idx 2 -> w = 4/8
BCW_WEIGHTS = (-2, 3, 4, 5, 10)     # g_BcwWeights (Rom.cpp:205)
# coding order {default, -2, +2, -1, +1} -> bcwIdx -> codingIdx
BCW_CODING_ORDER = (4, 2, 0, 1, 3)  # resetBcwCodingOrder (Rom.cpp:217)


@dataclasses.dataclass(frozen=True, eq=False)
class MotionInfo:
    inter_dir: int = 0             # 0 none, 1 L0, 2 L1, 3 BI
    mv0: tuple[int, int] = (0, 0)  # internal 1/16
    mv1: tuple[int, int] = (0, 0)
    ref0: int = -1
    ref1: int = -1
    bcw: int = BCW_DEFAULT         # CU bi-prediction weight index

    def __eq__(self, other):
        """MotionInfo::operator== parity (MotionInfo.h:116): motion
        only — BcwIdx is NOT compared (merge/HMVP pruning ignores it)."""
        if not isinstance(other, MotionInfo):
            return NotImplemented
        return (self.inter_dir == other.inter_dir
                and self.mv0 == other.mv0 and self.mv1 == other.mv1
                and self.ref0 == other.ref0 and self.ref1 == other.ref1)

    __hash__ = None


class MotionField:
    """Per-4x4-unit motion storage for one frame (SoA)."""

    def __init__(self, w: int, h: int):
        self.gw, self.gh = w // 4, h // 4
        self.inter_dir = np.zeros((self.gh, self.gw), np.int8)
        self.mv0 = np.zeros((self.gh, self.gw, 2), np.int32)
        self.ref0 = np.full((self.gh, self.gw), -1, np.int8)
        self.coded = np.zeros((self.gh, self.gw), bool)

    def set_cu(self, x, y, w, h, mi: MotionInfo):
        sl = np.s_[y // 4:(y + h) // 4, x // 4:(x + w) // 4]
        self.inter_dir[sl] = mi.inter_dir
        self.mv0[sl] = mi.mv0
        self.ref0[sl] = mi.ref0
        self.coded[sl] = True

    def get(self, x, y) -> MotionInfo | None:
        if x < 0 or y < 0 or x // 4 >= self.gw or y // 4 >= self.gh:
            return None
        gy, gx = y // 4, x // 4
        if not self.coded[gy, gx]:
            return None
        if self.inter_dir[gy, gx] == 0:
            return MotionInfo(0)
        return MotionInfo(int(self.inter_dir[gy, gx]),
                          (int(self.mv0[gy, gx, 0]), int(self.mv0[gy, gx, 1])),
                          (0, 0), int(self.ref0[gy, gx]), -1)

    def region(self, x, y, w, h):
        sl = np.s_[y // 4:(y + h) // 4, x // 4:(x + w) // 4]
        return (self.inter_dir[sl].copy(), self.mv0[sl].copy(),
                self.ref0[sl].copy(), self.coded[sl].copy())

    def restore_region(self, x, y, w, h, saved):
        sl = np.s_[y // 4:(y + h) // 4, x // 4:(x + w) // 4]
        self.inter_dir[sl], self.mv0[sl], self.ref0[sl], self.coded[sl] = saved


# ---------------------------------------------------------------------
# temporal MVP (TMVP)

_MV_MANTISSA_BITS = 6
_MV_EXPONENT_BITS = 4
_MV_MANTISSA_UPPER = (1 << (_MV_MANTISSA_BITS - 1)) - 1     # 31
_MV_MANTISSA_LIMIT = 1 << (_MV_MANTISSA_BITS - 1)           # 32
_MV_EXPONENT_MASK = (1 << _MV_EXPONENT_BITS) - 1            # 15


def _mv_fixed_to_float(val: int) -> int:
    """convertMvFixedToFloat (UnitTools.cpp:1420) — the colocated
    motion-field compression."""
    sign = -1 if val < 0 else 0
    scale = ((val ^ sign) | _MV_MANTISSA_UPPER).bit_length() - 1 \
        - (_MV_MANTISSA_BITS - 1)
    if scale >= 0:
        rnd = (1 << scale) >> 1
        n = (val + rnd) >> scale
        exponent = scale + ((n ^ sign) >> (_MV_MANTISSA_BITS - 1))
        mantissa = (n & _MV_MANTISSA_UPPER) | (sign << (_MV_MANTISSA_BITS - 1))
    else:
        exponent = 0
        mantissa = val
    return exponent | (mantissa << _MV_EXPONENT_BITS)


def _mv_float_to_fixed(val: int) -> int:
    exponent = val & _MV_EXPONENT_MASK
    mantissa = val >> _MV_EXPONENT_BITS
    if exponent == 0:
        return mantissa
    return (mantissa ^ _MV_MANTISSA_LIMIT) << (exponent - 1)


def round_mv_comp(x: int) -> int:
    """roundMvComp (UnitTools.cpp:1450)."""
    return _mv_float_to_fixed(_mv_fixed_to_float(x))


def dist_scale_factor(cur_poc, cur_ref_poc, col_poc, col_ref_poc) -> int:
    """xGetDistScaleFactor (UnitTools.cpp:1401)."""
    diff_d = col_poc - col_ref_poc
    diff_b = cur_poc - cur_ref_poc
    if diff_d == diff_b:
        return 4096
    tdb = min(max(diff_b, -128), 127)
    tdd = min(max(diff_d, -128), 127)
    x = _cdiv(0x4000 + abs(_cdiv(tdd, 2)), tdd)
    return min(max((tdb * x + 32) >> 6, -4096), 4095)


def _cdiv(a: int, b: int) -> int:
    """C-style (truncating) integer division."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _clip_storage(v: int) -> int:
    return min(max(v, -(1 << 17)), (1 << 17) - 1)


def scale_mv(mv, scale: int):
    """Mv::scaleMv (Mv.h:176)."""
    def comp(v):
        p = scale * v
        return min(max((p + 128 - (1 if p >= 0 else 0)) >> 8,
                       -(1 << 17)), (1 << 17) - 1)
    return (comp(mv[0]), comp(mv[1]))


@dataclasses.dataclass
class ColMotion:
    """Colocated picture motion field (per-4x4 SoA + its POC)."""
    poc: int
    inter_dir: np.ndarray
    mv0: np.ndarray
    ref_poc0: np.ndarray
    mv1: np.ndarray
    ref_poc1: np.ndarray


def get_colocated_mv(col: ColMotion, px: int, py: int, e_list: int,
                     cur_poc: int, cur_ref_poc: int, check_ldc: bool,
                     col_from_l0: bool, sb_flag: bool = False):
    """PU::getColocatedMVP parity (UnitTools.cpp:1500) for short-term
    refs; position must be pre-validated by the caller. -> mv or None.
    sb_flag: SbTMVP variant — with !checkLDC the requested list is
    used directly, no cross-list fallback."""
    px &= ~7
    py &= ~7
    g = (py // 4, px // 4)
    if int(col.inter_dir[g]) == 0:
        return None
    # eColRefPicList = checkLDC ? eRefPicList : RefPicList(colFromL0)
    e_col = e_list if check_ldc else int(col_from_l0)
    rps = (col.ref_poc0, col.ref_poc1)
    mvs = (col.mv0, col.mv1)
    if sb_flag and not check_ldc:
        e_col = e_list
        col_ref_poc = int(rps[e_col][g])
        if col_ref_poc == -1 or \
                (int(col.inter_dir[g]) & (1 << e_col)) == 0:
            return None
    else:
        col_ref_poc = int(rps[e_col][g])
        if col_ref_poc == -1 or \
                (int(col.inter_dir[g]) & (1 << e_col)) == 0:
            e_col = 1 - e_col
            col_ref_poc = int(rps[e_col][g])
            if col_ref_poc == -1 or \
                    (int(col.inter_dir[g]) & (1 << e_col)) == 0:
                return None
    mv = (round_mv_comp(int(mvs[e_col][g][0])),
          round_mv_comp(int(mvs[e_col][g][1])))
    scale = dist_scale_factor(cur_poc, cur_ref_poc, col.poc, col_ref_poc)
    if scale == 4096:
        return (_clip_storage(mv[0]), _clip_storage(mv[1]))
    return scale_mv(mv, scale)


def _tmvp_positions(x, y, w, h, pic_w, pic_h, ctu_size):
    """-> (c0 or None, c1): bottom-right C0 (same-CTU-row constrained)
    and center C1 (UnitTools.cpp:1184-1210)."""
    rb_x, rb_y = x + w - 4, y + h - 4
    c0 = None
    if (rb_x + 4) < pic_w and (rb_y + 4) < pic_h:
        if (rb_y & (ctu_size - 1)) + 4 < ctu_size:
            c0 = (rb_x + 4, rb_y + 4)
    c1 = (x + w // 2, y + h // 2)
    return c0, c1


def tmvp_merge_cand(tmvp, x, y, w, h):
    """The merge-list temporal candidate (refIdx 0 per list) or None.
    tmvp: dict(col, cur_poc, ref_poc_l0, ref_poc_l1, check_ldc,
    col_from_l0, pic_w, pic_h, ctu_size)."""
    if w + h <= 12:
        return None
    c0, c1 = _tmvp_positions(x, y, w, h, tmvp["pic_w"], tmvp["pic_h"],
                             tmvp["ctu_size"])

    def col_mv(e_list, cur_ref_poc):
        for pos in ([c0, c1] if c0 is not None else [c1]):
            mv = get_colocated_mv(tmvp["col"], pos[0], pos[1], e_list,
                                  tmvp["cur_poc"], cur_ref_poc,
                                  tmvp["check_ldc"],
                                  tmvp["col_from_l0"])
            if mv is not None:
                return mv
        return None

    direction = 0
    mv0 = mv1 = (0, 0)
    m = col_mv(0, tmvp["ref_poc_l0"])
    if m is not None:
        direction |= 1
        mv0 = m
    if tmvp.get("ref_poc_l1") is not None:
        m = col_mv(1, tmvp["ref_poc_l1"])
        if m is not None:
            direction |= 2
            mv1 = m
    if direction == 0:
        return None
    return MotionInfo(direction, mv0, mv1,
                      0 if direction & 1 else -1,
                      0 if direction & 2 else -1)


# ---------------------------------------------------------------------------
# SbTMVP (subblock temporal MVP) — PU::getInterMergeSubPuMvpCand
# (UnitTools.cpp:1046), clipColPos, getColocatedMVP sbFlag variant.
# With affine off it is the only subblock merge candidate
# (PU::getAffineMergeCand slot 0, MRG_TYPE_SUBPU_ATMVP).

def _mv_prec_floor_round(v: int, shift: int) -> int:
    """Mv::changePrecision right-shift rounding (Mv.h:183)."""
    off = 1 << (shift - 1)
    return (v + off - 1) >> shift if v >= 0 else (v + off) >> shift


def clip_col_pos(px, py, x, y, pic_w, pic_h, ctu_size):
    """clipColPos (UnitTools.cpp): CTU-row constrained collocated
    fetch window."""
    ctu_x = (x // ctu_size) * ctu_size
    ctu_y = (y // ctu_size) * ctu_size
    hor_max = min(pic_w - 1, ctu_x + ctu_size + 3)
    ver_max = min(pic_h - 1, ctu_y + ctu_size - 1)
    return (min(hor_max, max(ctu_x, px)), min(ver_max, max(ctu_y, py)))


def sbtmvp_candidate(tmvp, a1, a1_poc0, a1_poc1, x, y, w, h, is_b):
    """SbTMVP derivation. tmvp: the TMVP context dict; a1: left
    neighbor MotionInfo (or None) with its reference POCs.
    -> (ctr MotionInfo, grid [ny][nx] MotionInfo, sub_w, sub_h) or
    None."""
    col = tmvp["col"]
    pic_w, pic_h, cs = tmvp["pic_w"], tmvp["pic_h"], tmvp["ctu_size"]
    tvx = tvy = 0
    if a1 is not None:
        tv = None
        if (a1.inter_dir & 1) and a1_poc0 == col.poc:
            tv = a1.mv0
        elif is_b and (a1.inter_dir & 2) and a1_poc1 == col.poc:
            tv = a1.mv1
        if tv is not None:
            tvx = _mv_prec_floor_round(tv[0], MV_FRAC_BITS)
            tvy = _mv_prec_floor_round(tv[1], MV_FRAC_BITS)

    def col_lists(px, py):
        px, py = clip_col_pos(px, py, x, y, pic_w, pic_h, cs)
        px &= ~7
        py &= ~7
        g = (py // 4, px // 4)
        if int(col.inter_dir[g]) == 0:
            return 0, [(0, 0), (0, 0)]
        d = 0
        mvs = [(0, 0), (0, 0)]
        for lst in range(2 if is_b else 1):
            ref_poc = tmvp["ref_poc_l0"] if lst == 0 \
                else tmvp.get("ref_poc_l1")
            if ref_poc is None:
                continue
            mv = get_colocated_mv(col, px, py, lst, tmvp["cur_poc"],
                                  ref_poc, tmvp["check_ldc"],
                                  tmvp["col_from_l0"], sb_flag=True)
            if mv is not None:
                mvs[lst] = mv
                d |= 1 << lst
        return d, mvs

    ctr_dir, ctr = col_lists(x + (w >> 1) + tvx, y + (h >> 1) + tvy)
    if ctr_dir == 0:
        return None
    sub_w = 8 if w > 8 else w
    sub_h = 8 if h > 8 else h
    x_off = (sub_w >> 1) + tvx
    y_off = (sub_h >> 1) + tvy
    grid = []
    for sy in range(y, y + h, sub_h):
        row = []
        for sx in range(x, x + w, sub_w):
            d, mvs = col_lists(sx + x_off, sy + y_off)
            if d == 0:
                d, mvs = ctr_dir, ctr
            row.append(MotionInfo(
                d, tuple(mvs[0]), tuple(mvs[1]),
                0 if d & 1 else -1, 0 if d & 2 else -1))
        grid.append(row)
    ctr_mi = MotionInfo(ctr_dir, tuple(ctr[0]), tuple(ctr[1]),
                        0 if ctr_dir & 1 else -1,
                        0 if ctr_dir & 2 else -1)
    return ctr_mi, grid, sub_w, sub_h


def fill_mvp_cands(mf: MotionField, hmvp: list[MotionInfo],
                   x: int, y: int, w: int, h: int,
                   ref_poc_list0: list[int], ref_idx: int,
                   tmvp: bool = False, target_list: int = 0,
                   ref_poc_list1: list[int] | None = None,
                   imv: int = 0) -> list[tuple[int, int]]:
    """PU::fillMvpCand parity (imv=0), either list. tmvp: optional
    TMVP context dict (see tmvp_merge_cand) enabling the temporal
    AMVP candidate (UnitTools.cpp:1867).

    Neighbor candidates match when the POC of their reference (examined
    list first, then the other) equals the current target reference POC.
    Returns exactly AMVP_MAX_NUM_CANDS internal-precision MVs.
    """
    ref_poc_list1 = ref_poc_list1 if ref_poc_list1 is not None else []
    pocs = (ref_poc_list0, ref_poc_list1)
    curr_ref_poc = pocs[target_list][ref_idx]
    cands: list[tuple[int, int]] = []

    def mi_ref_mv(mi, lst):
        if lst == 0:
            return mi.ref0, mi.mv0
        return mi.ref1, mi.mv1

    def try_pos(px, py):
        mi = mf.get(px, py)
        if mi is None or mi.inter_dir == 0:
            return False
        for lst in (target_list, 1 - target_list):
            r, mv = mi_ref_mv(mi, lst)
            if r >= 0 and lst < 2 and r < len(pocs[lst]) \
                    and curr_ref_poc == pocs[lst][r]:
                cands.append(mv)
                return True
        return False

    lbx, lby = x, y + h - 1
    if not try_pos(lbx - 1, lby + 1):
        try_pos(lbx - 1, lby)
    rtx, rty = x + w - 1, y
    if not try_pos(rtx + 1, rty - 1):
        if not try_pos(rtx, rty - 1):
            try_pos(x - 1, y - 1)

    cands = [(mv_round_to_amvr(mx, imv), mv_round_to_amvr(my, imv))
             for mx, my in cands]
    if len(cands) == 2 and cands[0] == cands[1]:
        cands = cands[:1]

    # temporal AMVP candidate (UnitTools.cpp:1867)
    if tmvp and len(cands) < AMVP_MAX_NUM_CANDS and (w + h > 12):
        c0, c1 = _tmvp_positions(x, y, w, h, tmvp["pic_w"],
                                 tmvp["pic_h"], tmvp["ctu_size"])
        for pos in ([c0, c1] if c0 is not None else [c1]):
            mv = get_colocated_mv(tmvp["col"], pos[0], pos[1],
                                  target_list, tmvp["cur_poc"],
                                  curr_ref_poc, tmvp["check_ldc"],
                                  tmvp["col_from_l0"])
            if mv is not None:
                cands.append((mv_round_to_amvr(mv[0], imv),
                              mv_round_to_amvr(mv[1], imv)))
                break

    n_allowed = min(MAX_NUM_HMVP_AMVP_CANDS, len(hmvp))
    for i in range(n_allowed):
        if len(cands) >= AMVP_MAX_NUM_CANDS:
            break
        mi = hmvp[i]
        # VTM examines both lists of each LUT entry and may take both
        # (addAMVPHMVPCand inner predictorSource loop)
        for lst in (target_list, 1 - target_list):
            if len(cands) >= AMVP_MAX_NUM_CANDS:
                break
            r, mv = mi_ref_mv(mi, lst)
            if r >= 0 and r < len(pocs[lst]) \
                    and curr_ref_poc == pocs[lst][r]:
                cands.append((mv_round_to_amvr(mv[0], imv),
                              mv_round_to_amvr(mv[1], imv)))

    while len(cands) < AMVP_MAX_NUM_CANDS:
        cands.append((0, 0))
    return cands[:AMVP_MAX_NUM_CANDS]


# 4-tap 32-phase chroma MC filter (spec Table 33)
from .intra import CHROMA_FILTER  # noqa: E402  (shared normative table)


def mc_chroma(ref: np.ndarray, xc: int, yc: int, w: int, h: int,
              mv_internal: tuple[int, int], bit_depth: int = 10
              ) -> np.ndarray:
    """Chroma MC for a 4:2:0 block at chroma coords (xc, yc) with the
    LUMA internal-precision MV (chroma phase = mv & 31 in 1/32 chroma
    pel; integer part = mv >> 5 chroma samples)."""
    mvx, mvy = mv_internal
    int_x = xc + (mvx >> 5)
    int_y = yc + (mvy >> 5)
    frac_x = mvx & 31
    frac_y = mvy & 31
    head_room = IF_INTERNAL_PREC - bit_depth
    clip_hi = (1 << bit_depth) - 1

    if frac_x == 0 and frac_y == 0:
        return _gather_clamped(ref, int_x, int_y, w, h).astype(np.int32)
    if frac_y == 0:
        win = _gather_clamped(ref, int_x - 1, int_y, w + 3, h)
        f = CHROMA_FILTER[frac_x].astype(np.int64)
        acc = sum(f[i] * win[:, i:i + w] for i in range(4))
        out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
        return np.clip(out, 0, clip_hi).astype(np.int32)
    if frac_x == 0:
        win = _gather_clamped(ref, int_x, int_y - 1, w, h + 3)
        f = CHROMA_FILTER[frac_y].astype(np.int64)
        acc = sum(f[i] * win[i:i + h, :] for i in range(4))
        out = (acc + (1 << (IF_FILTER_PREC - 1))) >> IF_FILTER_PREC
        return np.clip(out, 0, clip_hi).astype(np.int32)

    win = _gather_clamped(ref, int_x - 1, int_y - 1, w + 3, h + 3)
    fx = CHROMA_FILTER[frac_x].astype(np.int64)
    shift1 = IF_FILTER_PREC - head_room
    off1 = -IF_INTERNAL_OFFS << shift1
    tmp = sum(fx[i] * win[:, i:i + w] for i in range(4))
    tmp = (tmp + off1) >> shift1
    fy = CHROMA_FILTER[frac_y].astype(np.int64)
    shift2 = IF_FILTER_PREC + head_room
    off2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
    acc = sum(fy[i] * tmp[i:i + h, :] for i in range(4))
    out = (acc + off2) >> shift2
    return np.clip(out, 0, clip_hi).astype(np.int32)


MRG_MAX_NUM_CANDS = 6


def get_merge_candidates(mf, hmvp: list[MotionInfo], x: int, y: int,
                         w: int, h: int, num_l0_refs: int,
                         max_cand: int = MRG_MAX_NUM_CANDS,
                         num_l1_refs: int = 0,
                         tmvp=None) -> list[MotionInfo]:
    """PU::getInterMergeCandidates parity (UnitTools.cpp:968) for P and
    B slices (spatial; TMVP when `tmvp` ctx given; HMVP; pairwise avg;
    zero padding).

    mf: object with .get(x, y) -> MotionInfo|None (maps adapter).
    Returns exactly max_cand candidates in decoder order.
    """
    is_b = num_l1_refs > 0
    cands: list[MotionInfo] = []

    def neighbor(px, py):
        mi = mf.get(px, py)
        if mi is None or mi.inter_dir == 0:
            return None
        return mi

    # B1 above (at posRT + (0,-1))
    b1 = neighbor(x + w - 1, y - 1)
    if b1 is not None:
        cands.append(b1)
    # A1 left (at posLB + (-1,0)), dedup vs B1
    a1 = neighbor(x - 1, y + h - 1)
    if a1 is not None and (b1 is None or a1 != b1):
        cands.append(a1)
    if len(cands) < max_cand:
        # B0 above-right, dedup vs B1
        b0 = neighbor(x + w, y - 1)
        if b0 is not None and (b1 is None or b0 != b1):
            cands.append(b0)
    if len(cands) < max_cand:
        # A0 below-left, dedup vs A1
        a0 = neighbor(x - 1, y + h)
        if a0 is not None and (a1 is None or a0 != a1):
            cands.append(a0)
    if len(cands) < max_cand and len(cands) < 4:
        # B2 above-left, dedup vs A1 and B1
        b2 = neighbor(x - 1, y - 1)
        if b2 is not None and (a1 is None or b2 != a1) \
                and (b1 is None or b2 != b1):
            cands.append(b2)

    # temporal candidate (after spatial, before HMVP; never pruned
    # against the spatial candidates)
    if tmvp is not None and len(cands) < max_cand:
        t = tmvp_merge_cand(tmvp, x, y, w, h)
        if t is not None:
            cands.append(t)

    # HMVP (newest first; first two entries dedup vs A1/B1); stops at
    # max_cand - 1
    if len(cands) != max_cand - 1:
        for idx in range(1, len(hmvp) + 1):
            if len(cands) >= max_cand - 1:
                break
            mi = hmvp[len(hmvp) - idx]
            if idx > 2 or ((a1 is None or mi != a1)
                           and (b1 is None or mi != b1)):
                cands.append(mi)

    # pairwise average of candidates 0 and 1 (per list)
    if 1 < len(cands) < max_cand:
        m0, m1 = cands[0], cands[1]
        inter_dir = 0
        mv_out = [(0, 0), (0, 0)]
        ref_out = [-1, -1]
        for lst in range(2 if is_b else 1):
            r0 = m0.ref0 if lst == 0 else m0.ref1
            r1 = m1.ref0 if lst == 0 else m1.ref1
            v0 = m0.mv0 if lst == 0 else m0.mv1
            v1 = m1.mv0 if lst == 0 else m1.mv1
            if r0 < 0 and r1 < 0:
                continue
            inter_dir += 1 << lst
            if r0 >= 0 and r1 >= 0:
                mv_out[lst] = (_round_affine(v0[0] + v1[0]),
                               _round_affine(v0[1] + v1[1]))
                ref_out[lst] = r0
            elif r0 >= 0:
                mv_out[lst] = v0
                ref_out[lst] = r0
            else:
                mv_out[lst] = v1
                ref_out[lst] = r1
        if inter_dir > 0:
            cands.append(MotionInfo(inter_dir, tuple(mv_out[0]),
                                    tuple(mv_out[1]), ref_out[0],
                                    ref_out[1]))

    # zero-MV padding with increasing refIdx
    num_ref = min(num_l0_refs, num_l1_refs) if is_b else num_l0_refs
    r = 0
    refcnt = 0
    while len(cands) < max_cand:
        if is_b:
            cands.append(MotionInfo(3, (0, 0), (0, 0), r, r))
        else:
            cands.append(MotionInfo(1, (0, 0), (0, 0), r, -1))
        if refcnt == num_ref - 1:
            r = 0
        else:
            r += 1
            refcnt += 1
    return cands[:max_cand]


# ---------------------------------------------------------------------
# MMVD (merge with MVD)

MMVD_REFINE_STEP = 8
MMVD_MAX_REFINE_NUM = MMVD_REFINE_STEP * 4
MMVD_BASE_MV_NUM = 2
MMVD_ADD_NUM = MMVD_MAX_REFINE_NUM * MMVD_BASE_MV_NUM
# distance table in quarter-pel units (CommonDef.h refMvdCands)
MMVD_DISTANCES = (1, 2, 4, 8, 16, 32, 64, 128)


def mmvd_motion(bases: list[MotionInfo], cand_idx: int, cur_poc: int,
                ref_pocs_l0: list[int], ref_pocs_l1: list[int],
                w: int, h: int, dis_frac: bool = False) -> MotionInfo:
    """MergeCtx::setMmvdMergeCandiInfo parity
    (ContextModelling.cpp:380): bases = first two regular merge
    candidates; cand_idx in [0, 64). Short-term references only
    (no long-term handling). Applies the small-CU bi-pred
    restriction (PU::restrictBiPredMergeCandsOne)."""
    base_idx = cand_idx // MMVD_MAX_REFINE_NUM
    tmp = cand_idx - base_idx * MMVD_MAX_REFINE_NUM
    step, pos = tmp // 4, tmp % 4
    offset = MMVD_DISTANCES[step] << 2          # quarter -> internal
    if dis_frac:
        offset <<= 2
    off = ((offset, 0), (-offset, 0), (0, offset), (0, -offset))[pos]
    base = bases[base_idx]
    r0, r1 = base.ref0, base.ref1

    def add_clip(mv, t):
        return (_clip_storage(mv[0] + t[0]), _clip_storage(mv[1] + t[1]))

    if r0 >= 0 and r1 >= 0:
        poc0, poc1 = ref_pocs_l0[r0], ref_pocs_l1[r1]
        t0 = t1 = off
        if (poc0 - cur_poc) == (poc1 - cur_poc):
            pass
        elif abs(poc1 - cur_poc) > abs(poc0 - cur_poc):
            scale = dist_scale_factor(cur_poc, poc0, cur_poc, poc1)
            t0 = scale_mv(off, scale)
        else:
            scale = dist_scale_factor(cur_poc, poc1, cur_poc, poc0)
            t1 = scale_mv(off, scale)
        mi = MotionInfo(3, add_clip(base.mv0, t0), add_clip(base.mv1, t1),
                        r0, r1, bcw=base.bcw)
        if w + h == 12:                         # bi-pred restriction
            mi = MotionInfo(1, mi.mv0, (0, 0), r0, -1)
        return mi
    if r0 >= 0:
        return MotionInfo(1, add_clip(base.mv0, off), (0, 0), r0, -1)
    return MotionInfo(2, (0, 0), add_clip(base.mv1, off), -1, r1)


def _round_affine(v: int, shift: int = 1) -> int:
    """roundAffineMv parity (Mv.cpp:47)."""
    offset = 1 << (shift - 1)
    return (v + offset - (1 if v >= 0 else 0)) >> shift


def hmvp_update(hmvp: list[MotionInfo], mi: MotionInfo):
    """CodingStructure::addMiToLut parity (FIFO with pruning)."""
    for i, c in enumerate(hmvp):
        if c == mi:
            hmvp.pop(i)
            break
    else:
        if len(hmvp) == MAX_NUM_HMVP_CANDS:
            hmvp.pop(0)
    hmvp.append(mi)
