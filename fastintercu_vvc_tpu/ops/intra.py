"""Intra prediction (normative, spec §8.4.5.2) — planar / DC / angular,
PDPC, reference-sample construction + smoothing.

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/IntraPrediction.cpp —
xFillReferenceSamples (:~880), xFilterReferenceSamples, xPredIntraPlanar
(:292), xPredIntraDc (:350), predIntraAng PDPC (:243-265),
initPredIntraParams (:357).

Integer-exact numpy implementation used by the sequential recon path;
the batched JAX variant for RDO mode search evaluates many blocks of one
geometry at once (same math, vmapped).

Reference layout convention (matches VTM's 2-row ref buffer):
  top[0]  = top-left corner sample; top[1..2W]  = row above
  left[0] = top-left corner sample; left[1..2H] = column to the left
"""

from __future__ import annotations

import numpy as np

PLANAR_IDX = 0
DC_IDX = 1
HOR_IDX = 18
DIA_IDX = 34
VER_IDX = 50
NUM_LUMA_MODE = 67

# intraPredAngle table (spec Table 27 / VTM initPredIntraParams angTable)
ANG_TABLE = [0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32,
             35, 39, 45, 51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512,
             1024]
INV_ANG_TABLE = [0, 16384, 8192, 5461, 4096, 2731, 2048, 1638, 1365, 1170,
                 1024, 910, 819, 712, 630, 565, 512, 468, 420, 364, 321,
                 287, 256, 224, 191, 161, 128, 96, 64, 48, 32, 16]


def build_refs(recon: np.ndarray, x: int, y: int, w: int, h: int,
               bit_depth: int = 10, avail_mask=None):
    """Construct unfiltered reference arrays (top[2W+1], left[2H+1]) for a
    block at (x, y) from the reconstructed picture.

    avail_mask(bx, by) -> bool tells whether the 4x4 unit containing
    sample (bx, by) is available (already reconstructed & inside the
    slice). Default: available iff inside the picture and (by < y) or
    (by in row range and bx < x) — raster coding order.

    Parity: xFillReferenceSamples incl. the unavailable-substitution scan
    (fill from last below-left upward/rightward; all-unavailable -> DC).
    """
    H, W = recon.shape
    ref_size_top = 2 * w
    ref_size_left = 2 * h
    unit = 4

    if avail_mask is None:
        def avail_mask(bx, by):
            if bx < 0 or by < 0 or bx >= W or by >= H:
                return False
            if by < y:
                return True
            if by < y + h and bx < x:
                # left column units: available down to the CU bottom only
                return True
            return False

    # gather candidate samples with availability per unit
    # positions: left column bottom-up then corner then top row l-to-r
    # (the spec's substitution scan order)
    n_left_units = (ref_size_left + unit - 1) // unit
    n_top_units = (ref_size_top + unit - 1) // unit

    # sample positions
    top_pos = [(x - 1 + i, y - 1) for i in range(ref_size_top + 1)]
    left_pos = [(x - 1, y - 1 + i) for i in range(ref_size_left + 1)]

    def clamped(px, py):
        return recon[min(max(py, 0), H - 1), min(max(px, 0), W - 1)]

    # availability by unit
    def unit_avail(px, py):
        return avail_mask(px, py)

    top_avail = [unit_avail(px, py) for px, py in top_pos]
    left_avail = [unit_avail(px, py) for px, py in left_pos]

    any_avail = any(top_avail) or any(left_avail)
    dcval = 1 << (bit_depth - 1)
    top = np.full(ref_size_top + 1, dcval, np.int32)
    left = np.full(ref_size_left + 1, dcval, np.int32)

    if not any_avail:
        return top, left

    for i, (px, py) in enumerate(top_pos):
        if top_avail[i]:
            top[i] = clamped(px, py)
    for i, (px, py) in enumerate(left_pos):
        if left_avail[i]:
            left[i] = clamped(px, py)

    # substitution: scan from bottom-most left sample up to corner, then
    # along top row; replace unavailable with last available predecessor
    # (spec 8.4.5.2.8 substitution process)
    seq_avail = list(reversed(left_avail[1:])) + [left_avail[0] or top_avail[0]] + top_avail[1:]
    seq_vals = list(reversed(list(left[1:]))) + [int(left[0]) if (left_avail[0] or top_avail[0]) else dcval] + list(top[1:])
    # find first available
    first = next(i for i, a in enumerate(seq_avail) if a)
    # fill backwards from first available
    for i in range(first - 1, -1, -1):
        seq_vals[i] = seq_vals[i + 1]
        seq_avail[i] = True
    for i in range(first + 1, len(seq_vals)):
        if not seq_avail[i]:
            seq_vals[i] = seq_vals[i - 1]
            seq_avail[i] = True
    # unpack
    nl = ref_size_left
    left_f = np.asarray(list(reversed(seq_vals[:nl])), np.int32)
    corner = seq_vals[nl]
    top_f = np.asarray(seq_vals[nl + 1:], np.int32)
    top_out = np.concatenate([[corner], top_f]).astype(np.int32)
    left_out = np.concatenate([[corner], left_f]).astype(np.int32)
    return top_out, left_out


def filter_refs(top: np.ndarray, left: np.ndarray):
    """[1 2 1]/4 reference smoothing (xFilterReferenceSamples parity)."""
    ft = top.copy()
    fl = left.copy()
    corner = (int(left[1]) + 2 * int(top[0]) + int(top[1]) + 2) >> 2
    ft[0] = corner
    fl[0] = corner
    ft[1:-1] = (top[:-2].astype(np.int64) + 2 * top[1:-1] + top[2:] + 2) >> 2
    fl[1:-1] = (left[:-2].astype(np.int64) + 2 * left[1:-1] + left[2:] + 2) >> 2
    return ft.astype(np.int32), fl.astype(np.int32)


def needs_ref_filter(mode: int, w: int, h: int) -> bool:
    """MDIS decision (initPredIntraParams parity) for non-ISP, refIdx 0,
    luma."""
    if mode == DC_IDX:
        return False
    if mode == PLANAR_IDX:
        return w * h > 32
    # angular: filter on integer-slope modes when size large enough
    # (full MDIS rule implemented with the angular path)
    predMode = wide_angle(w, h, mode)
    diff = min(abs(predMode - HOR_IDX), abs(predMode - VER_IDX))
    log2_size = ((w.bit_length() - 1) + (h.bit_length() - 1)) >> 1
    thresholds = [24, 14, 2, 0, 0, 0, 0, 0]  # g_aucIntraFilter
    filter_flag = diff > thresholds[log2_size]
    if not filter_flag:
        return False
    # only for integer-slope angles (fractional uses interpolation switch)
    ang = _pred_angle(predMode)
    return ang != 0 and (abs(ang) & 31) == 0


def wide_angle(w: int, h: int, mode: int) -> int:
    """getModifiedWideAngle (UnitTools parity, spec 8.4.5.2.7)."""
    if mode <= DC_IDX or w == h:
        return mode
    modeShift = [0, 6, 10, 12, 14, 15]
    if w > h:
        shift = modeShift[min(5, (w // h).bit_length() - 1 + ((w // h) & (w // h - 1) != 0))]
        # exact: deltaSize = abs(log2(w) - log2(h))
        delta = abs((w.bit_length() - 1) - (h.bit_length() - 1))
        shift = modeShift[min(5, delta)]
        if mode < 2 + shift:
            return mode + 65
    else:
        delta = abs((w.bit_length() - 1) - (h.bit_length() - 1))
        shift = modeShift[min(5, delta)]
        if mode > 66 - shift:
            return mode - 67
    return mode


def _pred_angle(predMode: int) -> int:
    is_ver = predMode >= DIA_IDX
    ang_mode = (predMode - VER_IDX) if is_ver else -(predMode - HOR_IDX)
    sign = -1 if ang_mode < 0 else 1
    return sign * ANG_TABLE[abs(ang_mode)]


def predict_planar(top: np.ndarray, left: np.ndarray, w: int, h: int
                   ) -> np.ndarray:
    """xPredIntraPlanar parity. top/left per build_refs layout."""
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    t = top[1:w + 2].astype(np.int64)       # top[x], x=0..w (incl topRight)
    l = left[1:h + 2].astype(np.int64)      # left[y], y=0..h (incl bottomLeft)
    bottom_left = l[h]
    top_right = t[w]
    xs = np.arange(w)
    ys = np.arange(h)
    bottom_row = bottom_left - t[:w]
    top_row = t[:w] << log2h
    right_col = top_right - l[:h]
    left_col = l[:h] << log2w
    ver = top_row[None, :] + (ys[:, None] + 1) * bottom_row[None, :]
    hor = left_col[:, None] + (xs[None, :] + 1) * right_col[:, None]
    return (((hor << log2h) + (ver << log2w) + (1 << (log2w + log2h)))
            >> (log2w + log2h + 1)).astype(np.int32)


def predict_dc(top: np.ndarray, left: np.ndarray, w: int, h: int
               ) -> np.ndarray:
    """xGetPredValDc parity: averages the longer side (or both if w==h)."""
    t = top[1:w + 1].astype(np.int64)
    l = left[1:h + 1].astype(np.int64)
    if w == h:
        s = t.sum() + l.sum()
        dc = (s + w) >> (w.bit_length())  # (sum + (w+h)/2) / (w+h)
        dc = (t.sum() + l.sum() + ((w + h) >> 1)) // (w + h)
    elif w > h:
        dc = (t.sum() + (w >> 1)) >> (w.bit_length() - 1)
    else:
        dc = (l.sum() + (h >> 1)) >> (h.bit_length() - 1)
    return np.full((h, w), int(dc), np.int32)


def apply_pdpc_planar_dc(pred: np.ndarray, top: np.ndarray,
                         left: np.ndarray) -> np.ndarray:
    """PDPC for planar/DC (predIntraAng parity, CABAC-neutral filter)."""
    h, w = pred.shape
    scale = (((w.bit_length() - 1) - 2 + (h.bit_length() - 1) - 2 + 2) >> 2)
    ys = np.arange(h)
    xs = np.arange(w)
    wT = 32 >> np.minimum(31, (ys << 1) >> scale)      # [h]
    wL = 32 >> np.minimum(31, (xs << 1) >> scale)      # [w]
    l = left[1:h + 1].astype(np.int64)[:, None]        # [h,1]
    t = top[1:w + 1].astype(np.int64)[None, :]         # [1,w]
    val = pred.astype(np.int64)
    out = val + ((wL[None, :] * (l - val) + wT[:, None] * (t - val) + 32) >> 6)
    return out.astype(np.int32)


def predict(mode: int, top: np.ndarray, left: np.ndarray, w: int, h: int,
            apply_pdpc: bool = True) -> np.ndarray:
    """Full intra prediction for planar/DC (angular in a later rev)."""
    if mode == PLANAR_IDX:
        p = predict_planar(top, left, w, h)
    elif mode == DC_IDX:
        p = predict_dc(top, left, w, h)
    else:
        raise NotImplementedError(f"angular mode {mode}")
    if apply_pdpc and w >= 4 and h >= 4:
        p = apply_pdpc_planar_dc(p, top, left)
    return p
