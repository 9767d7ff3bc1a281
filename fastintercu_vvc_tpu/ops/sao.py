"""Sample Adaptive Offset (normative application, spec §8.8.4) +
encoder parameter estimation + CTU syntax.

Behavioral parity: CommonLib/SampleAdaptiveOffset.cpp offsetBlock
(:293) / invertQuantOffsets (:148), EncoderLib/CABACWriter.cpp sao
(:243) sao_block_pars/sao_offset_pars, CABACReader sao (EO sign
inference: valley classes +, peak classes -; Cr inherits mode/type
from Cb). Estimation follows EncSampleAdaptiveOffset's
statistics->offset->RD structure in vectorized numpy (non-normative).

Param model per CTB per component:
  None                                -> OFF
  ("eo", cls, [o0, o1, o3, o4])       -> edge offsets, signed values
       cls in 0..3 (EO_0 horizontal, EO_90 vertical, EO_135, EO_45);
       o0/o1 >= 0 (valley), o3/o4 <= 0 (peak)
  ("bo", band_pos, [4 signed offsets]) -> bands (band_pos + i) % 32

Constraint (decoder parity): Cb and Cr share mode, type and EO class.
"""

from __future__ import annotations

import numpy as np

# neighbor offsets per EO class: (dy0, dx0), (dy1, dx1)
_EO_NEIGH = [((0, -1), (0, 1)),      # EO_0 horizontal
             ((-1, 0), (1, 0)),      # EO_90 vertical
             ((-1, -1), (1, 1)),     # EO_135
             ((1, -1), (-1, 1))]     # EO_45


def max_offset_qval(bit_depth: int) -> int:
    """SampleAdaptiveOffset::getMaxOffsetQVal."""
    return (1 << (min(bit_depth, 10) - 5)) - 1


def _eo_class_and_valid(src: np.ndarray, cls: int):
    """Whole-plane edge category (0..4) + validity (both neighbors in
    picture). category = sign(c-n0) + sign(c-n1) + 2."""
    H, W = src.shape
    (dy0, dx0), (dy1, dx1) = _EO_NEIGH[cls]
    p = np.pad(src, 1, mode="edge").astype(np.int64)
    c = p[1:H + 1, 1:W + 1]
    n0 = p[1 + dy0:H + 1 + dy0, 1 + dx0:W + 1 + dx0]
    n1 = p[1 + dy1:H + 1 + dy1, 1 + dx1:W + 1 + dx1]
    cat = np.sign(c - n0) + np.sign(c - n1) + 2
    yy, xx = np.mgrid[0:H, 0:W]
    valid = ((yy + dy0 >= 0) & (yy + dy0 < H) & (xx + dx0 >= 0)
             & (xx + dx0 < W) & (yy + dy1 >= 0) & (yy + dy1 < H)
             & (xx + dx1 >= 0) & (xx + dx1 < W))
    return cat.astype(np.int32), valid


def _apply_ctb(src, dst, y0, x0, s, param, bit_depth):
    """Apply one CTB's param; src = whole pre-SAO plane (neighbors may
    cross CTB boundaries and must read pre-SAO samples)."""
    H, W = src.shape
    y1, x1 = min(y0 + s, H), min(x0 + s, W)
    sl = np.s_[y0:y1, x0:x1]
    clip_hi = (1 << bit_depth) - 1
    if param is None:
        return
    kind = param[0]
    region = src[sl].astype(np.int64)
    if kind == "bo":
        band_pos, offs = param[1], param[2]
        lut = np.zeros(32, np.int64)
        for i in range(4):
            lut[(band_pos + i) % 32] = offs[i]
        band = region >> (bit_depth - 5)
        dst[sl] = np.clip(region + lut[band], 0, clip_hi)
    else:
        cls, offs = param[1], param[2]
        cat, valid = _eo_class_and_valid(src, cls)
        lut = np.asarray([offs[0], offs[1], 0, offs[2], offs[3]],
                         np.int64)
        out = np.clip(region + lut[cat[sl]], 0, clip_hi)
        dst[sl] = np.where(valid[sl], out, region)


def apply_frame(rec_y, rec_cb, rec_cr, params, ctu_size, bit_depth):
    """In-place SAO over all planes. params: dict comp -> 2-D list of
    per-CTB params (comp 0 luma CTB=ctu_size; 1/2 chroma =ctu_size/2)."""
    planes = [(rec_y, ctu_size, 0)]
    if rec_cb is not None:
        planes += [(rec_cb, ctu_size // 2, 1), (rec_cr, ctu_size // 2, 2)]
    for plane, s, comp in planes:
        src = plane.copy()
        grid = params[comp]
        for ry, row in enumerate(grid):
            for rx, param in enumerate(row):
                _apply_ctb(src, plane, ry * s, rx * s, s, param,
                           bit_depth)


# ---------------------------------------------------------------------
# estimation (non-normative; EncSampleAdaptiveOffset structure)

def _best_offset(cnt, ssum, lo, hi):
    """argmin over off in [lo, hi] of cnt*off^2 - 2*off*ssum; ->
    (off, dist_delta)."""
    if cnt == 0:
        return 0, 0.0
    raw = ssum / cnt
    best_off, best_d = 0, 0.0
    for off in {int(np.floor(raw)), int(np.ceil(raw)), 0}:
        off = min(max(off, lo), hi)
        d = cnt * off * off - 2 * off * ssum
        if d < best_d:
            best_off, best_d = off, d
    return best_off, best_d


def _ctb_stats_eo(diff, cat, valid, sl):
    cnt = np.zeros(5, np.int64)
    ssum = np.zeros(5, np.int64)
    c = cat[sl][valid[sl]]
    d = diff[sl][valid[sl]]
    np.add.at(cnt, c, 1)
    np.add.at(ssum, c, d)
    return cnt, ssum


def _eval_eo(diff, cat, valid, sl, max_off, lam):
    cnt, ssum = _ctb_stats_eo(diff, cat, valid, sl)
    offs, dist, bits = [], 0.0, 2 + 2   # type bins + eo class
    for k, (lo, hi) in zip((0, 1, 3, 4), ((0, max_off), (0, max_off),
                                          (-max_off, 0), (-max_off, 0))):
        off, d = _best_offset(int(cnt[k]), int(ssum[k]), lo, hi)
        offs.append(off)
        dist += d
        bits += abs(off) + 1
    return offs, dist + lam * bits, dist


def _eval_bo(diff, band, sl, bit_depth, max_off, lam):
    cnt = np.zeros(32, np.int64)
    ssum = np.zeros(32, np.int64)
    np.add.at(cnt, band[sl].ravel(), 1)
    np.add.at(ssum, band[sl].ravel(), diff[sl].ravel())
    per_off = np.zeros(32, np.int64)
    per_d = np.zeros(32)
    for b in range(32):
        per_off[b], per_d[b] = _best_offset(int(cnt[b]), int(ssum[b]),
                                            -max_off, max_off)
    best = None
    for start in range(32):
        idx = [(start + i) % 32 for i in range(4)]
        dist = float(per_d[idx].sum())
        offs = [int(per_off[i]) for i in idx]
        bits = 2 + 5 + sum(abs(o) + 1 + (1 if o else 0) for o in offs)
        cost = dist + lam * bits
        if best is None or cost < best[0]:
            best = (cost, start, offs, dist)
    return best[1], best[2], best[0], best[3]


def estimate_frame(org_y, rec_y, org_cb, rec_cb, org_cr, rec_cr,
                   ctu_size, bit_depth, lam):
    """-> params dict for apply_frame/write_sao_ctu. Luma decided per
    CTB; Cb/Cr jointly (shared mode/type/EO class)."""
    max_off = max_offset_qval(bit_depth)
    H, W = org_y.shape
    nry = (H + ctu_size - 1) // ctu_size
    nrx = (W + ctu_size - 1) // ctu_size
    params = {0: [[None] * nrx for _ in range(nry)]}

    def prep(org, rec):
        diff = (org - rec).astype(np.int64)
        cats = [_eo_class_and_valid(rec, c) for c in range(4)]
        band = (rec >> (bit_depth - 5)).astype(np.int64)
        return diff, cats, band

    dy, catsy, bandy = prep(org_y, rec_y)
    for ry in range(nry):
        for rx in range(nrx):
            sl = np.s_[ry * ctu_size:(ry + 1) * ctu_size,
                       rx * ctu_size:(rx + 1) * ctu_size]
            best = (0.0, None)           # OFF
            for cls in range(4):
                cat, valid = catsy[cls]
                offs, cost, _ = _eval_eo(dy, cat, valid, sl, max_off, lam)
                if any(offs) and cost < best[0]:
                    best = (cost, ("eo", cls, offs))
            bpos, offs, cost, _ = _eval_bo(dy, bandy, sl, bit_depth,
                                           max_off, lam)
            if any(offs) and cost < best[0]:
                best = (cost, ("bo", bpos, offs))
            params[0][ry][rx] = best[1]

    if org_cb is None:
        return params

    s = ctu_size // 2
    params[1] = [[None] * nrx for _ in range(nry)]
    params[2] = [[None] * nrx for _ in range(nry)]
    dcb, catscb, bandcb = prep(org_cb, rec_cb)
    dcr, catscr, bandcr = prep(org_cr, rec_cr)
    for ry in range(nry):
        for rx in range(nrx):
            sl = np.s_[ry * s:(ry + 1) * s, rx * s:(rx + 1) * s]
            best = (0.0, None, None)     # OFF for both
            for cls in range(4):
                ob, cb_cost, cb_d = _eval_eo(dcb, *catscb[cls], sl,
                                             max_off, lam)
                orr, cr_cost, cr_d = _eval_eo(dcr, *catscr[cls], sl,
                                              max_off, lam)
                cost = cb_cost + cr_cost
                if (any(ob) or any(orr)) and cost < best[0]:
                    best = (cost, ("eo", cls, ob), ("eo", cls, orr))
            bp_b, ob, _, d_b = _eval_bo(dcb, bandcb, sl, bit_depth,
                                        max_off, lam)
            bp_r, orr, _, d_r = _eval_bo(dcr, bandcr, sl, bit_depth,
                                         max_off, lam)
            bits = (2 + 10 + sum(abs(o) + 1 + (1 if o else 0)
                                 for o in ob + orr))
            cost = d_b + d_r + lam * bits
            if (any(ob) or any(orr)) and cost < best[0]:
                best = (cost, ("bo", bp_b, ob), ("bo", bp_r, orr))
            params[1][ry][rx] = best[1]
            params[2][ry][rx] = best[2]
    return params


# ---------------------------------------------------------------------
# syntax

def _unary_max_eqprob(enc, symbol, max_symbol):
    if max_symbol == 0:
        return
    code_last = max_symbol > symbol
    for _ in range(symbol):
        enc.encode_bin_ep(1)
    if code_last:
        enc.encode_bin_ep(0)


def _write_offset_pars(enc, param, is_first_of_ch, bit_depth):
    """sao_offset_pars parity (CABACWriter.cpp:305)."""
    from ..codec import ctx_ids
    max_off = max_offset_qval(bit_depth)
    if is_first_of_ch:
        if param is None:
            enc.encode_bin(0, ctx_ids.SaoTypeIdx[0])
        elif param[0] == "bo":
            enc.encode_bin(1, ctx_ids.SaoTypeIdx[0])
            enc.encode_bin_ep(0)
        else:
            enc.encode_bin(1, ctx_ids.SaoTypeIdx[0])
            enc.encode_bin_ep(1)
    if param is None:
        return
    kind = param[0]
    offs = param[2]
    for o in offs:
        _unary_max_eqprob(enc, abs(o), max_off)
    if kind == "bo":
        for o in offs:
            if o:
                enc.encode_bin_ep(1 if o < 0 else 0)
        enc.encode_bins_ep(param[1], 5)          # sao_band_position
    else:
        if is_first_of_ch:
            enc.encode_bins_ep(param[1], 2)      # sao_eo_class


def write_sao_ctu(enc, params, rx, ry, chroma: bool, bit_depth: int):
    """sao() + sao_block_pars parity for one CTU (no merge selection:
    merge flags coded 0 when available)."""
    from ..codec import ctx_ids
    if rx > 0:
        enc.encode_bin(0, ctx_ids.SaoMergeFlag[0])
    if ry > 0:
        enc.encode_bin(0, ctx_ids.SaoMergeFlag[0])
    _write_offset_pars(enc, params[0][ry][rx], True, bit_depth)
    if chroma:
        _write_offset_pars(enc, params[1][ry][rx], True, bit_depth)
        # Cr inherits mode/type/eo-class from Cb
        _write_offset_pars(enc, params[2][ry][rx], False, bit_depth)
