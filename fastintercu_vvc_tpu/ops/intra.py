"""Intra prediction (normative, spec §8.4.5.2) — all 67 modes + wide
angle, PDPC, reference-sample construction + smoothing, MPM derivation.

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/IntraPrediction.cpp —
xFillReferenceSamples, xFilterReferenceSamples, xPredIntraPlanar (:292),
xPredIntraDc (:350), xPredIntraAng (:~460), predIntraAng PDPC (:243),
initPredIntraParams (:357), getModifiedWideAngle (:183), MDIS table
m_aucIntraFilter (:58); UnitTools.cpp PU::getIntraMPMs, PU::getWideAngle.

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
VDIA_IDX = 66
NUM_LUMA_MODE = 67

# intraPredAngle / invAngle tables (spec Table 27; initPredIntraParams)
ANG_TABLE = [0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32,
             35, 39, 45, 51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512,
             1024]
INV_ANG_TABLE = [0, 16384, 8192, 5461, 4096, 2731, 2048, 1638, 1365, 1170,
                 1024, 910, 819, 712, 630, 565, 512, 468, 420, 364, 321,
                 287, 256, 224, 191, 161, 128, 96, 64, 48, 32, 16]

# MDIS thresholds per log2 size (m_aucIntraFilter)
INTRA_FILTER_THRES = [24, 24, 24, 14, 2, 0, 0, 0]

# 4-tap 32-phase chroma MC filter (spec Table 33; InterpolationFilter.cpp
# m_chromaFilter) — also the "cubic" DCT-IF filter for luma intra interp.
CHROMA_FILTER = np.asarray([
    [0, 64, 0, 0], [-1, 63, 2, 0], [-2, 62, 4, 0], [-2, 60, 7, -1],
    [-2, 58, 10, -2], [-3, 57, 12, -2], [-4, 56, 14, -2], [-4, 55, 15, -2],
    [-4, 54, 16, -2], [-5, 53, 18, -2], [-6, 52, 20, -2], [-6, 49, 24, -3],
    [-6, 46, 28, -4], [-5, 44, 29, -4], [-4, 42, 30, -4], [-4, 39, 33, -4],
    [-4, 36, 36, -4], [-4, 33, 39, -4], [-4, 30, 42, -4], [-4, 29, 44, -5],
    [-4, 28, 46, -6], [-3, 24, 49, -6], [-2, 20, 52, -6], [-2, 18, 53, -5],
    [-2, 16, 54, -4], [-2, 15, 55, -4], [-2, 14, 56, -4], [-2, 12, 57, -3],
    [-2, 10, 58, -2], [-1, 7, 60, -2], [0, 4, 62, -2], [0, 2, 63, -1]],
    np.int32)


def modified_wide_angle(w: int, h: int, mode: int) -> int:
    """getModifiedWideAngle parity: returns the (possibly out-of-range)
    prediction mode used to derive intraPredAngle."""
    if DC_IDX < mode <= VDIA_IDX:
        mode_shift = [0, 6, 10, 12, 14, 15]
        delta = abs((w.bit_length() - 1) - (h.bit_length() - 1))
        if w > h and mode < 2 + mode_shift[delta]:
            mode += VDIA_IDX - 1
        elif h > w and mode > VDIA_IDX - mode_shift[delta]:
            mode -= VDIA_IDX - 1
    return mode


def _angle_params(pred_mode: int):
    """-> (is_ver, intra_pred_angle, abs_inv_angle)."""
    is_ver = pred_mode >= DIA_IDX
    ang_mode = (pred_mode - VER_IDX) if is_ver else -(pred_mode - HOR_IDX)
    sign = -1 if ang_mode < 0 else 1
    abs_ang = ANG_TABLE[abs(ang_mode)]
    return is_ver, sign * abs_ang, INV_ANG_TABLE[abs(ang_mode)]


def is_integer_slope(abs_ang: int) -> bool:
    return (abs_ang & 31) == 0


def mrl_mode_safe(mode: int, w: int, h: int, mrl: int) -> bool:
    """Whether an MRL prediction stays within the guaranteed reference
    range. Wide-angle modes (|ang| > 32) with multiRefIdx > 0 can
    index past the 2W+maxIndex extension the spec/VTM fill
    (IntraPrediction.cpp:512-521) — VTM reads stale stack beyond it,
    so such (mode, shape, mrl) combinations are simply never selected
    by this encoder."""
    if mode <= DC_IDX or mrl == 0:
        return True
    pm = modified_wide_angle(w, h, mode)
    is_ver, ang, _ = _angle_params(pm)
    if ang <= 0:
        return True
    width, height = (w, h) if is_ver else (h, w)
    log2r = (w.bit_length() - 1) - (h.bit_length() - 1)
    sft = max(0, log2r if is_ver else -log2r)
    worst = mrl + (((height + mrl) * ang) >> 5) + width + 3
    return worst <= 2 * width + mrl + (mrl << sft) + 2


def pred_params(mode: int, w: int, h: int, mrl: int = 0,
                isp_cu_dims=None):
    """initPredIntraParams parity for luma; mrl = multiRefIdx
    (reference smoothing/MDIS and PDPC disabled for mrl > 0,
    IntraPrediction.cpp:374,408-414). isp_cu_dims = (cuW, cuH) for ISP
    partitions: the wide-angle mapping uses the CU dimensions while
    PDPC uses the partition dimensions, and reference
    smoothing/interpolation-filter switching is disabled
    (IntraPrediction.cpp:366,411).

    -> dict(refFilter, interpFilter, applyPDPC, angularScale, predMode,
    mrl)
    """
    if isp_cu_dims is not None:
        pred_mode = modified_wide_angle(isp_cu_dims[0], isp_cu_dims[1],
                                        mode)
    else:
        pred_mode = modified_wide_angle(w, h, mode)
    apply_pdpc = w >= 4 and h >= 4 and mrl == 0
    ref_filter = False
    interp_filter = False
    angular_scale = 0
    if mode > DC_IDX:
        is_ver, ang, inv_ang = _angle_params(pred_mode)
        ang_mode = (pred_mode - VER_IDX) if is_ver else -(pred_mode - HOR_IDX)
        if ang_mode < 0:
            apply_pdpc = False
        elif ang_mode > 0:
            side = h if is_ver else w
            angular_scale = min(
                2, (side.bit_length() - 1)
                - (((3 * inv_ang - 2).bit_length() - 1) - 8))
            apply_pdpc = apply_pdpc and angular_scale >= 0
        if mode != DC_IDX and mrl == 0 and isp_cu_dims is None:
            diff = min(abs(pred_mode - HOR_IDX), abs(pred_mode - VER_IDX))
            log2_size = (((w.bit_length() - 1) + (h.bit_length() - 1)) >> 1)
            if diff > INTRA_FILTER_THRES[log2_size]:
                if is_integer_slope(abs(ang)):
                    ref_filter = True
                else:
                    interp_filter = True
    elif mode == PLANAR_IDX:
        ref_filter = w * h > 32 and mrl == 0 and isp_cu_dims is None
    return dict(refFilter=ref_filter, interpFilter=interp_filter,
                applyPDPC=apply_pdpc, angularScale=angular_scale,
                predMode=pred_mode, mrl=mrl)


def build_refs(recon: np.ndarray, x: int, y: int, w: int, h: int,
               bit_depth: int = 10, avail_mask=None):
    """Construct unfiltered reference arrays (top[2W+1], left[2H+1]) for a
    block at (x, y) from the reconstructed picture (xFillReferenceSamples
    parity incl. the unavailable-substitution scan)."""
    H, W = recon.shape

    if avail_mask is None:
        def avail_mask(bx, by):
            if bx < 0 or by < 0 or bx >= W or by >= H:
                return False
            if by < y:
                return True
            if by < y + h and bx < x:
                return True
            return False

    ref_size_top = 2 * w
    ref_size_left = 2 * h
    top_pos = [(x - 1 + i, y - 1) for i in range(ref_size_top + 1)]
    left_pos = [(x - 1, y - 1 + i) for i in range(ref_size_left + 1)]

    def clamped(px, py):
        return recon[min(max(py, 0), H - 1), min(max(px, 0), W - 1)]

    top_avail = [avail_mask(px, py) for px, py in top_pos]
    left_avail = [avail_mask(px, py) for px, py in left_pos]

    dcval = 1 << (bit_depth - 1)
    top = np.full(ref_size_top + 1, dcval, np.int32)
    left = np.full(ref_size_left + 1, dcval, np.int32)

    if not (any(top_avail) or any(left_avail)):
        return top, left

    for i, (px, py) in enumerate(top_pos):
        if top_avail[i]:
            top[i] = clamped(px, py)
    for i, (px, py) in enumerate(left_pos):
        if left_avail[i]:
            left[i] = clamped(px, py)

    # substitution scan: bottom-most left -> corner -> top row rightwards
    seq_avail = list(reversed(left_avail[1:])) + [left_avail[0]] + top_avail[1:]
    seq_vals = list(reversed(list(left[1:]))) + [int(left[0])] + list(top[1:])
    first = next(i for i, a in enumerate(seq_avail) if a)
    for i in range(first - 1, -1, -1):
        seq_vals[i] = seq_vals[i + 1]
    for i in range(first + 1, len(seq_vals)):
        if not seq_avail[i]:
            seq_vals[i] = seq_vals[i - 1]
    nl = ref_size_left
    left_f = np.asarray(list(reversed(seq_vals[:nl])), np.int32)
    corner = seq_vals[nl]
    top_f = np.asarray(seq_vals[nl + 1:], np.int32)
    return (np.concatenate([[corner], top_f]).astype(np.int32),
            np.concatenate([[corner], left_f]).astype(np.int32))


def build_refs_grid(recon: np.ndarray, x: int, y: int, w: int, h: int,
                    bit_depth: int, coded: np.ndarray, sub: int = 1,
                    mrl: int = 0, xmax: int | None = None):
    """Vectorized build_refs against a per-4x4-luma-unit coded grid
    (the encoder maps). sub=2 for chroma planes (availability is read
    at luma resolution). Bit-identical to build_refs with the encoder
    availability mask.

    xmax: exclusive luma-x availability bound (the WPP wavefront
    restriction, CodingStructure::getCURestricted,
    CodingStructure.cpp:1693 — neighbors at or beyond the next CTU
    column are unavailable).

    mrl > 0: line-k references (xFillReferenceSamples with
    multiRefIdx, IntraPrediction.cpp:991-1019) — top/left grow by k,
    samples come from row y-1-k / column x-1-k, the k corner-region
    samples share the corner unit's availability, and availability is
    always judged at the line-0 adjacent units."""
    H, W = recon.shape
    gh, gw = coded.shape

    def avail(pxs, pys):
        lx = pxs * sub
        ly = pys * sub
        ok = (pxs >= 0) & (pys >= 0) & (lx // 4 < gw) & (ly // 4 < gh)
        if xmax is not None:
            ok = ok & (lx < xmax)
        out = np.zeros(np.broadcast(pxs, pys).shape, bool)
        gxi = np.clip(lx // 4, 0, gw - 1)
        gyi = np.clip(ly // 4, 0, gh - 1)
        np.copyto(out, coded[gyi, gxi], where=ok)
        return out

    nt = 2 * w + 1 + mrl
    nl = 2 * h + 1 + mrl
    tposx = x - 1 - mrl + np.arange(nt)
    lposy = y - 1 - mrl + np.arange(nl)
    if mrl == 0:
        top_avail = avail(tposx, np.full_like(tposx, y - 1))
        left_avail = avail(np.full_like(lposy, x - 1), lposy)
    else:
        # availability judged at the line-0 neighbor units; the first
        # 1 + mrl entries (corner region) take the corner unit's flag
        top_avail = avail(np.maximum(tposx, x - 1),
                          np.full_like(tposx, y - 1))
        left_avail = avail(np.full_like(lposy, x - 1),
                           np.maximum(lposy, y - 1))
        corner_ok = avail(np.asarray([x - 1]), np.asarray([y - 1]))[0]
        top_avail[:1 + mrl] = corner_ok
        left_avail[:1 + mrl] = corner_ok

    dcval = 1 << (bit_depth - 1)
    top = np.full(nt, dcval, np.int32)
    left = np.full(nl, dcval, np.int32)
    if not (top_avail.any() or left_avail.any()):
        return top, left

    top_v = recon[min(max(y - 1 - mrl, 0), H - 1), np.clip(tposx, 0, W - 1)]
    left_v = recon[np.clip(lposy, 0, H - 1), min(max(x - 1 - mrl, 0), W - 1)]
    np.copyto(top, top_v.astype(np.int32), where=top_avail)
    np.copyto(left, left_v.astype(np.int32), where=left_avail)

    # substitution scan: bottom-most left -> corner -> top row rightwards
    seq_avail = np.concatenate([left_avail[:0:-1], left_avail[:1],
                                top_avail[1:]])
    seq_vals = np.concatenate([left[:0:-1], left[:1], top[1:]])
    n = len(seq_vals)
    first = int(np.argmax(seq_avail))
    seq_vals[:first] = seq_vals[first]
    av = seq_avail.copy()
    av[:first + 1] = True
    keep = np.where(av, np.arange(n), 0)
    np.maximum.accumulate(keep, out=keep)
    seq_vals = seq_vals[keep]

    nleft = nl - 1
    out_top = np.empty(nt, np.int32)
    out_left = np.empty(nl, np.int32)
    out_top[0] = out_left[0] = seq_vals[nleft]
    out_top[1:] = seq_vals[nleft + 1:]
    out_left[1:] = seq_vals[nleft - 1::-1]
    return out_top, out_left


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


def predict_planar(top: np.ndarray, left: np.ndarray, w: int, h: int
                   ) -> np.ndarray:
    """xPredIntraPlanar parity."""
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    t = top[1:w + 2].astype(np.int64)
    l = left[1:h + 2].astype(np.int64)
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


def predict_dc(top: np.ndarray, left: np.ndarray, w: int, h: int,
               mrl: int = 0) -> np.ndarray:
    """xGetPredValDc parity: averages the longer side (both if
    square); samples from the mrl-th line (IntraPrediction.cpp:168)."""
    t = top[mrl + 1:mrl + w + 1].astype(np.int64)
    l = left[mrl + 1:mrl + h + 1].astype(np.int64)
    if w == h:
        denom = w << 1
        s = t.sum() + l.sum()
    elif w > h:
        denom = w
        s = t.sum()
    else:
        denom = h
        s = l.sum()
    dc = (s + (denom >> 1)) >> (denom.bit_length() - 1)
    return np.full((h, w), int(dc), np.int32)


def _pdpc_planar_dc(pred, top, left):
    h, w = pred.shape
    scale = (((w.bit_length() - 1) - 2 + (h.bit_length() - 1) - 2 + 2) >> 2)
    ys = np.arange(h)
    xs = np.arange(w)
    wT = (32 >> np.minimum(31, (ys << 1) >> scale)).astype(np.int64)
    wL = (32 >> np.minimum(31, (xs << 1) >> scale)).astype(np.int64)
    l = left[1:h + 1].astype(np.int64)[:, None]
    t = top[1:w + 1].astype(np.int64)[None, :]
    val = pred.astype(np.int64)
    out = val + ((wL[None, :] * (l - val) + wT[:, None] * (t - val) + 32) >> 6)
    return out.astype(np.int32)


def predict_angular(mode: int, top: np.ndarray, left: np.ndarray,
                    w: int, h: int, params=None,
                    bit_depth: int = 10, chroma: bool = False,
                    ref_lengths=None) -> np.ndarray:
    """xPredIntraAng parity. top/left must already be filtered if
    params['refFilter']. chroma=True uses the 2-tap linear
    interpolation (IntraPrediction.cpp:~590 'Do linear filtering').
    params['mrl'] > 0: multi-reference-line prediction — top/left hold
    the line-k references (length +k) and indexing/start offsets follow
    IntraPrediction.cpp:479-565 (refMain += multiRefIdx, deltaPos
    starts at angle * (1 + multiRefIdx))."""
    if params is None:
        params = pred_params(mode, w, h)
    pred_mode = params["predMode"]
    mrl = params.get("mrl", 0)
    is_ver, ang, abs_inv = _angle_params(pred_mode)
    clip_hi = (1 << bit_depth) - 1

    width, height = (w, h) if is_ver else (h, w)
    # main/side reference 1-D arrays; `off` maps post-shift refMain
    # index 0 (refMain += multiRefIdx applied via off)
    if ang < 0:
        refMain = np.zeros(height + width + 2 + 1 + mrl, np.int64)
        off = height  # pre-shift refMain[k] at array idx k + off
        src_main = top if is_ver else left
        src_side = left if is_ver else top
        for i in range(0, width + 2 + mrl):
            refMain[i + off] = src_main[i]
        sizeSide = height
        for k in range(-sizeSide, 0):
            idx = min((-k * abs_inv + 256) >> 9, sizeSide)
            refMain[k + off] = src_side[idx]
        side = src_side
        off += mrl            # refMain += multiRefIdx
    else:
        # refLength = m_topRefLength / m_leftRefLength — 2*width in the
        # standard case, shortened/extended for ISP partitions
        # (IntraPrediction.cpp xPredIntraAng positive-angle fill)
        if ref_lengths is not None:
            refLength = ref_lengths[0] if is_ver else ref_lengths[1]
        else:
            refLength = 2 * width
        log2_ratio = (width.bit_length() - height.bit_length())
        sft = max(0, log2_ratio if is_ver else -log2_ratio)
        max_index = (mrl << sft) + 2
        # extension must hold maxIndex entries past refLength + mrl
        # (IntraPrediction.cpp positive-angle fill; aspect ratios >= 8
        # with MRL push the shift beyond the old 3 + 4*mrl bound)
        refMain = np.zeros(refLength + mrl + max_index + 1, np.int64)
        off = 0
        src_main = top if is_ver else left
        src_side = left if is_ver else top
        refMain[:refLength + 1 + mrl] = src_main[:refLength + 1 + mrl]
        for z in range(1, max_index + 1):
            refMain[refLength + mrl + z] = src_main[refLength + mrl]
        side = src_side
        off = mrl             # refMain += multiRefIdx

    pred = np.zeros((height, width), np.int64)
    if ang == 0:
        for yy in range(height):
            pred[yy, :] = refMain[off + 1: off + 1 + width]
            if params["applyPDPC"]:
                scale = ((width.bit_length() - 1) + (height.bit_length() - 1) - 2) >> 2
                top_left = refMain[off]
                lft = side[1 + yy]
                for xx in range(min(3 << scale, width)):
                    wL = 32 >> (2 * xx >> scale)
                    val = pred[yy, xx]
                    val = val + ((wL * (lft - top_left) + 32) >> 6)
                    pred[yy, xx] = min(max(val, 0), clip_hi)
    else:
        use_cubic = not params["interpFilter"]
        delta_pos = ang * (1 + mrl)
        for yy in range(height):
            delta_int = delta_pos >> 5
            delta_fract = delta_pos & 31
            xs = np.arange(width)
            if not is_integer_slope(abs(ang)):
                if chroma:
                    p0 = refMain[off + delta_int + 1 + xs]
                    p1 = refMain[off + delta_int + 2 + xs]
                    pred[yy, :] = p0 + ((delta_fract * (p1 - p0) + 16) >> 5)
                elif use_cubic:
                    f = CHROMA_FILTER[delta_fract]
                    base = off + delta_int + xs
                    val = (f[0] * refMain[base] + f[1] * refMain[base + 1]
                           + f[2] * refMain[base + 2]
                           + f[3] * refMain[base + 3] + 32) >> 6
                    pred[yy, :] = np.clip(val, 0, clip_hi)
                else:
                    f = np.asarray([16 - (delta_fract >> 1),
                                    32 - (delta_fract >> 1),
                                    16 + (delta_fract >> 1),
                                    delta_fract >> 1], np.int32)
                    base = off + delta_int + xs
                    val = (f[0] * refMain[base] + f[1] * refMain[base + 1]
                           + f[2] * refMain[base + 2]
                           + f[3] * refMain[base + 3] + 32) >> 6
                    pred[yy, :] = np.clip(val, 0, clip_hi)
            else:
                pred[yy, :] = refMain[off + delta_int + 1 + xs]
            if params["applyPDPC"]:
                scale = params["angularScale"]
                inv_angle_sum = 256
                for xx in range(min(3 << scale, width)):
                    inv_angle_sum += abs_inv
                    wL = 32 >> (2 * xx >> scale)
                    lft = side[yy + (inv_angle_sum >> 9) + 1]
                    pred[yy, xx] = pred[yy, xx] + (
                        (wL * (lft - pred[yy, xx]) + 32) >> 6)
            delta_pos += ang
    if not is_ver:
        pred = pred.T
    return pred.astype(np.int32)


def predict(mode: int, top: np.ndarray, left: np.ndarray, w: int, h: int,
            bit_depth: int = 10, chroma: bool = False,
            mrl: int = 0, isp_cu_dims=None,
            ref_lengths=None) -> np.ndarray:
    """Full intra prediction incl. PDPC. top/left are UNFILTERED;
    smoothing is applied internally per the MDIS rules (luma only —
    initPredIntraParams disables smoothing for chroma). mrl: multi
    reference line index (top/left from build_refs_grid(mrl=k);
    planar is not valid for mrl > 0). isp_cu_dims/ref_lengths: ISP
    partition prediction (CU-dims wide-angle mapping, adjusted
    m_topRefLength/m_leftRefLength)."""
    params = pred_params(mode, w, h, mrl=mrl, isp_cu_dims=isp_cu_dims)
    if chroma:
        params = dict(params, refFilter=False)
    if params["refFilter"]:
        top, left = filter_refs(top, left)
    if mode == PLANAR_IDX:
        assert mrl == 0, "planar is excluded with MRL"
        p = predict_planar(top, left, w, h)
        if params["applyPDPC"]:
            p = _pdpc_planar_dc(p, top, left)
    elif mode == DC_IDX:
        p = predict_dc(top, left, w, h, mrl=mrl)
        if params["applyPDPC"]:
            p = _pdpc_planar_dc(p, top, left)
    else:
        p = predict_angular(mode, top, left, w, h, params, bit_depth,
                            chroma=chroma, ref_lengths=ref_lengths)
    return p


def get_intra_mpms(left_mode: int | None, above_mode: int | None):
    """PU::getIntraMPMs parity. left/above = luma intra dir of the
    neighbor PU (None if unavailable/not intra)."""
    L = left_mode if left_mode is not None else PLANAR_IDX
    A = above_mode if above_mode is not None else PLANAR_IDX
    offset = NUM_LUMA_MODE - 6   # 61
    mod = offset + 3             # 64
    mpm = [PLANAR_IDX, DC_IDX, VER_IDX, HOR_IDX, VER_IDX - 4, VER_IDX + 4]
    if L == A:
        if L > DC_IDX:
            mpm = [PLANAR_IDX, L,
                   ((L + offset) % mod) + 2,
                   ((L - 1) % mod) + 2,
                   ((L + offset - 1) % mod) + 2,
                   (L % mod) + 2]
    else:
        if L > DC_IDX and A > DC_IDX:
            mpm[0] = PLANAR_IDX
            mpm[1] = L
            mpm[2] = A
            mx, mn = (1, 2) if mpm[1] > mpm[2] else (2, 1)
            if mpm[mx] - mpm[mn] == 1:
                mpm[3] = ((mpm[mn] + offset) % mod) + 2
                mpm[4] = ((mpm[mx] - 1) % mod) + 2
                mpm[5] = ((mpm[mn] + offset - 1) % mod) + 2
            elif mpm[mx] - mpm[mn] >= 62:
                mpm[3] = ((mpm[mn] - 1) % mod) + 2
                mpm[4] = ((mpm[mx] + offset) % mod) + 2
                mpm[5] = (mpm[mn] % mod) + 2
            elif mpm[mx] - mpm[mn] == 2:
                mpm[3] = ((mpm[mn] - 1) % mod) + 2
                mpm[4] = ((mpm[mn] + offset) % mod) + 2
                mpm[5] = ((mpm[mx] - 1) % mod) + 2
            else:
                mpm[3] = ((mpm[mn] + offset) % mod) + 2
                mpm[4] = ((mpm[mn] - 1) % mod) + 2
                mpm[5] = ((mpm[mx] + offset) % mod) + 2
        elif L + A >= 2:
            m = max(L, A)
            mpm[0] = PLANAR_IDX
            mpm[1] = m
            mpm[2] = ((m + offset) % mod) + 2
            mpm[3] = ((m - 1) % mod) + 2
            mpm[4] = ((m + offset - 1) % mod) + 2
            mpm[5] = (m % mod) + 2
    return mpm


# ---------------------------------------------------------------------------
# CCLM (cross-component linear model) — LM_CHROMA 81 / MDLM_L 82 / MDLM_T 83

LM_CHROMA_IDX = 81
MDLM_L_IDX = 82
MDLM_T_IDX = 83

# 4-bit significand division table (xGetLMParameters,
# IntraPrediction.cpp:1786)
_DIV_SIG_TABLE = (0, 7, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1, 1, 1, 0)


def cclm_downsample(recon_y, xc, yc, wc, hc, above, left, first_ctu_row,
                    added_ar=0, added_lb=0):
    """xGetLumaRecPixels parity for 4:2:0, vertical-collocated flag OFF
    (the 6-tap {1,2,1;1,2,1}/8 filter; 3-tap {1,2,1}/4 on the first CTU
    row's above template). Chroma coords/sizes.

    -> (inner [hc,wc], top template [wc+added_ar] or None,
        left template [hc+added_lb] or None)
    """
    H, W = recon_y.shape
    x0, y0 = 2 * xc, 2 * yc

    def rc(yy, xx):
        return recon_y[np.clip(yy, 0, H - 1),
                       np.clip(xx, 0, W - 1)].astype(np.int32)

    def ds6(yy, xx, xm1):
        """Vectorized 6-tap; xm1 = xx column minus (0 when left-padded
        else 1), broadcastable with xx."""
        return (4 + 2 * rc(yy, xx) + rc(yy, xx + 1) + rc(yy, xm1)
                + 2 * rc(yy + 1, xx) + rc(yy + 1, xx + 1)
                + rc(yy + 1, xm1)) >> 3

    ii = x0 + 2 * np.arange(wc)
    lp = np.zeros(wc, bool)
    lp[0] = not left                       # i == 0 and no left template
    xm1 = ii - np.where(lp, 0, 1)
    jj = (y0 + 2 * np.arange(hc))[:, None]
    inner = ds6(jj, ii[None, :], xm1[None, :]).astype(np.int32)
    top = None
    if above:
        n = wc + added_ar
        it = x0 + 2 * np.arange(n)
        lpt = np.zeros(n, bool)
        lpt[0] = not left
        xm1t = it - np.where(lpt, 0, 1)
        if first_ctu_row:
            top = ((2 + 2 * rc(y0 - 1, it) + rc(y0 - 1, it + 1)
                    + rc(y0 - 1, xm1t)) >> 2).astype(np.int32)
        else:
            top = ds6(np.full(n, y0 - 2), it, xm1t).astype(np.int32)
    lft = None
    if left:
        n = hc + added_lb
        jl = y0 + 2 * np.arange(n)
        lft = ds6(jl, np.full(n, x0 - 2),
                  np.full(n, x0 - 3)).astype(np.int32)
    return inner, top, lft


def cclm_params(sel_luma, sel_chroma, bit_depth=10):
    """xGetLMParameters 4-point min/max model fit
    (IntraPrediction.cpp:1744-1806). sel_* are the picked template
    samples (length 0, 2 or 4). -> (a, b, shift)."""
    cnt = len(sel_luma)
    if cnt == 0:
        return 0, 1 << (bit_depth - 1), 0
    lum = list(sel_luma) + [0] * (4 - cnt)
    chr_ = list(sel_chroma) + [0] * (4 - cnt)
    if cnt == 2:
        lum[3], chr_[3] = lum[0], chr_[0]
        lum[2], chr_[2] = lum[1], chr_[1]
        lum[0], chr_[0] = lum[1], chr_[1]
        lum[1], chr_[1] = lum[3], chr_[3]
    mn = [0, 2]
    mx = [1, 3]
    if lum[mn[0]] > lum[mn[1]]:
        mn = [mn[1], mn[0]]
    if lum[mx[0]] > lum[mx[1]]:
        mx = [mx[1], mx[0]]
    if lum[mn[0]] > lum[mx[1]]:
        mn, mx = mx, mn
    if lum[mn[1]] > lum[mx[0]]:
        mn[1], mx[0] = mx[0], mn[1]
    min_l = (lum[mn[0]] + lum[mn[1]] + 1) >> 1
    min_c = (chr_[mn[0]] + chr_[mn[1]] + 1) >> 1
    max_l = (lum[mx[0]] + lum[mx[1]] + 1) >> 1
    max_c = (chr_[mx[0]] + chr_[mx[1]] + 1) >> 1
    diff = max_l - min_l
    if diff <= 0:
        return 0, min_c, 0
    diff_c = max_c - min_c
    x = diff.bit_length() - 1
    norm_diff = ((diff << 4) >> x) & 15
    v = _DIV_SIG_TABLE[norm_diff] | 8
    x += int(norm_diff != 0)
    y = (abs(diff_c).bit_length() - 1) + 1 if diff_c else 1
    add = (1 << y) >> 1
    a = (diff_c * v + add) >> y
    shift = 3 + x - y
    if shift < 1:
        shift = 1
        a = 0 if a == 0 else (-15 if a < 0 else 15)
    b = min_c - ((a * min_l) >> shift)
    return a, b, shift


def cclm_select_positions(mode, wc, hc, above, left, avai_ar_units,
                          avai_lb_units):
    """The template-sample picking of xGetLMParameters: returns
    (top_positions, left_positions) index lists into the downsampled
    top/left templates, plus the above/left availability after the
    MDLM overrides and the extension lengths (added_ar, added_lb)."""
    unit = 2                       # chroma unit size (MIN_CU 4 luma)
    added_ar = added_lb = 0
    if mode == MDLM_T_IDX:
        left = False
        ar = min(avai_ar_units, hc // unit)
        added_ar = ar * unit
        actual_top = unit * (wc // unit + ar) if above else 0
        actual_left = 0
    elif mode == MDLM_L_IDX:
        above = False
        lb = min(avai_lb_units, wc // unit)
        added_lb = lb * unit
        actual_left = unit * (hc // unit + lb) if left else 0
        actual_top = 0
    else:
        actual_top = wc if above else 0
        actual_left = hc if left else 0
    above_is4 = 0 if left else 1
    left_is4 = 0 if above else 1
    tpos, lpos = [], []
    if above:
        start = actual_top >> (2 + above_is4)
        step = max(1, actual_top >> (1 + above_is4))
        cnt_t = min(actual_top, (1 + above_is4) << 1)
        pos = start
        for _ in range(cnt_t):
            tpos.append(pos)
            pos += step
    if left:
        start = actual_left >> (2 + left_is4)
        step = max(1, actual_left >> (1 + left_is4))
        cnt_l = min(actual_left, (1 + left_is4) << 1)
        pos = start
        for _ in range(cnt_l):
            lpos.append(pos)
            pos += step
    return tpos, lpos, above, left, added_ar, added_lb


def cclm_predict(inner, a, b, shift, bit_depth=10):
    """PelBuf::linearTransform parity (clip on)."""
    val = ((inner.astype(np.int64) * a) >> shift) + b
    return np.clip(val, 0, (1 << bit_depth) - 1).astype(np.int32)
