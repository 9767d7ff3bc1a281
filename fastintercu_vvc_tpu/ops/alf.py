"""Adaptive Loop Filter: luma fixed sets + adaptive APS Wiener
filters, chroma ALF, and cross-component ALF.

Behavioral parity: CommonLib/AdaptiveLoopFilter.cpp —
deriveClassificationBlk (:848: subsampled Laplacians, activity
quantization, directionality/transpose), filterBlk<ALF_FILTER_7>
(:1059: 7x7 diamond, virtual-boundary tap clipping, near-VB shift),
filterBlk<ALF_FILTER_5> chroma, applyCcAlfFilter; fixed filter
construction (:772: m_classToFilterMapping x m_fixedFilterSetCoeff).
Encoder side: per-(CTB, class) Wiener statistics + greedy class
merging + RD-chosen filter count (EncAdaptiveLoopFilter
deriveFilter/mergeClasses/deriveCoeffQuant analogues), per-CTB on/off
RD, APS emission. CTU syntax: CABACWriter codeAlfCtuEnableFlag
(:3263) + codeAlfCtuFilterIndex (:3384) + alternative indices.
"""

from __future__ import annotations

import functools
import os

import numpy as np

ALF_VB_POS_ABOVE = 4                # luma rows above the CTU row end
NUM_FIXED_FILTER_SETS = 16
NUM_CLASSES = 25
SHIFT = 7                           # m_NUM_BITS - 1
_ACT_TH = np.asarray([0, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 4],
                     np.int32)
_TRANSPOSE_TAB = np.asarray([0, 1, 0, 2, 2, 3, 1, 3], np.int32)


@functools.lru_cache(maxsize=1)
def _tables():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "alf.npz")
    d = np.load(path)
    return d["fixed_filters"], d["class_to_filter"]


@functools.lru_cache(maxsize=1)
def fixed_filter_sets() -> np.ndarray:
    """[16, 25, 12] per-set per-class coefficients."""
    fixed, mapping = _tables()
    return fixed[mapping]           # fancy-index -> [16, 25, 12]


def classify(plane: np.ndarray, bit_depth: int, ctu_size: int):
    """-> (class_idx, transpose_idx) per 4x4 block
    (deriveClassificationBlk parity, whole picture vectorized)."""
    H, W = plane.shape
    vb_pos = ctu_size - ALF_VB_POS_ABOVE
    shift = bit_depth + 4
    p = np.pad(plane.astype(np.int64), 3, mode="edge")

    # subsampled gradient lattice: centers at (2*gi - 2, 2*gj - 2)
    # (the reference's src1 row posY+i-2 with the built-in -3 column
    # offset of its row pointers)
    gh, gw = (H + 4) // 2, (W + 4) // 2
    ys = np.arange(gh) * 2 - 2
    xs = np.arange(gw) * 2 - 2

    c = p[3 + ys[:, None], 3 + xs[None, :]] << 1
    up1 = p[3 + ys[:, None] + 1, 3 + xs[None, :] + 1] << 1

    def g(dy, dx):
        return p[3 + ys[:, None] + dy, 3 + xs[None, :] + dx]

    ver = np.abs(c - g(-1, 0) - g(1, 0)) + np.abs(up1 - g(0, 1) - g(2, 1))
    hor = np.abs(c - g(0, 1) - g(0, -1)) + np.abs(up1 - g(1, 2) - g(1, 0))
    d0 = np.abs(c - g(-1, -1) - g(1, 1)) + np.abs(up1 - g(0, 0) - g(2, 2))
    d1 = np.abs(c - g(1, -1) - g(-1, 1)) + np.abs(up1 - g(2, 0) - g(0, 2))

    # virtual-boundary gradient suppression: rows whose sample pair
    # straddles the VB replicate the neighbor row (src3/src0 swap).
    yin_row = ys & (ctu_size - 1)
    m_low = (ys > 0) & (yin_row == vb_pos - 2)    # src3 := src2
    m_up = (ys > 0) & (yin_row == vb_pos)         # src0 := src1
    if m_low.any():
        ver = np.where(m_low[:, None],
                       np.abs(c - g(-1, 0) - g(1, 0))
                       + np.abs(up1 - g(0, 1) - g(1, 1)), ver)
        d0 = np.where(m_low[:, None],
                      np.abs(c - g(-1, -1) - g(1, 1))
                      + np.abs(up1 - g(0, 0) - g(1, 2)), d0)
        d1 = np.where(m_low[:, None],
                      np.abs(c - g(1, -1) - g(-1, 1))
                      + np.abs(up1 - g(1, 0) - g(0, 2)), d1)
    if m_up.any():
        ver = np.where(m_up[:, None],
                       np.abs(c - g(0, 0) - g(1, 0))
                       + np.abs(up1 - g(0, 1) - g(2, 1)), ver)
        d0 = np.where(m_up[:, None],
                      np.abs(c - g(0, -1) - g(1, 1))
                      + np.abs(up1 - g(0, 0) - g(2, 2)), d0)
        d1 = np.where(m_up[:, None],
                      np.abs(c - g(1, -1) - g(0, 1))
                      + np.abs(up1 - g(2, 0) - g(0, 2)), d1)

    nby, nbx = H // 4, W // 4
    # per-4x4 block sums over the 4x4 lattice window at (2*by, 2*bx),
    # with the VB rows dropping one lattice row
    r0 = 2 * np.arange(nby)
    ybase = 4 * np.arange(nby)
    yin = ybase & (ctu_size - 1)

    def bsum(gr):
        rcs = np.pad(gr.cumsum(axis=1), ((0, 0), (1, 0)))
        c0 = 2 * np.arange(nbx)
        rows = rcs[:, c0 + 4] - rcs[:, c0]           # [gh, nbx]
        full = rows[r0] + rows[r0 + 1] + rows[r0 + 2] + rows[r0 + 3]
        drop_last = yin == vb_pos - 4
        drop_first = yin == vb_pos
        out = np.where(drop_last[:, None], full - rows[r0 + 3], full)
        out = np.where(drop_first[:, None], full - rows[r0], out)
        return out

    sv, sh_, s0, s1 = bsum(ver), bsum(hor), bsum(d0), bsum(d1)

    mult = np.where((yin == vb_pos - 4) | (yin == vb_pos), 96,
                    64)[:, None]
    activity = np.clip((sv + sh_) * mult >> shift, 0, 15)
    class_idx = _ACT_TH[activity].astype(np.int32)

    hv_is_v = sv > sh_
    hv1 = np.where(hv_is_v, sv, sh_)
    hv0 = np.where(hv_is_v, sh_, sv)
    dir_hv = np.where(hv_is_v, 1, 3)
    d_is_0 = s0 > s1
    dd1 = np.where(d_is_0, s0, s1)
    dd0 = np.where(d_is_0, s1, s0)
    dir_d = np.where(d_is_0, 0, 2)
    d_wins = dd1 * hv0 > hv1 * dd0
    hvd1 = np.where(d_wins, dd1, hv1)
    hvd0 = np.where(d_wins, dd0, hv0)
    main_dir = np.where(d_wins, dir_d, dir_hv)
    sec_dir = np.where(d_wins, dir_hv, dir_d)
    strength = (hvd1 > 2 * hvd0).astype(np.int32) \
        + (hvd1 * 2 > 9 * hvd0).astype(np.int32)
    class_idx = np.where(
        strength > 0,
        class_idx + (((main_dir & 1) << 1) + strength) * 5, class_idx)
    tr = _TRANSPOSE_TAB[main_dir * 2 + (sec_dir >> 1)].astype(np.int32)
    return class_idx.astype(np.int32), tr


# 7x7 diamond tap geometry: tap k adds coeff[k] * (sample(+dy,+dx) +
# sample(-dy,-dx) - 2*curr); order matches filterBlk's coefficient
# order 0..11 (pImg5..pImg0 pairs)
_TAPS7 = [(3, 0), (2, 1), (2, 0), (2, -1), (1, 2), (1, 1), (1, 0),
          (1, -1), (1, -2), (0, 3), (0, 2), (0, 1)]

_TRANSPOSE_MAP = {
    0: list(range(12)),
    1: [9, 4, 10, 8, 1, 5, 11, 7, 3, 0, 2, 6],
    2: [0, 3, 2, 1, 8, 7, 6, 5, 4, 9, 10, 11],
    3: [9, 8, 10, 4, 3, 7, 11, 5, 1, 0, 2, 6],
}


def _clamped_dy(dy, y, ctu_size):
    """Virtual-boundary tap clipping for a sample at picture row y
    (filterBlk VB logic expressed as per-tap dy clamp)."""
    vb_pos = ctu_size - ALF_VB_POS_ABOVE
    yvb = y & (ctu_size - 1)
    if vb_pos - 4 <= yvb < vb_pos:
        dist = vb_pos - 1 - yvb          # 0..3: rows below available
        lim = min(dist, 3)
        return max(min(dy, lim), -lim) if lim > 0 else 0
    if vb_pos <= yvb <= vb_pos + 3:
        dist = yvb - vb_pos              # 0..3: rows above available
        lim = min(dist, 3)
        return max(min(dy, lim), -lim) if lim > 0 else 0
    return dy


@functools.lru_cache(maxsize=4)
def _permuted_sets(set_idx: int) -> np.ndarray:
    """[4, 25, 12]: per-transpose permuted coefficients of one set."""
    filters = fixed_filter_sets()[set_idx]     # [25, 12]
    return np.stack([filters[:, _TRANSPOSE_MAP[t]] for t in range(4)])


@functools.lru_cache(maxsize=1)
def _all_permuted_sets() -> np.ndarray:
    """[16, 4, 25, 12] fixed sets permuted per transpose index."""
    return np.stack([_permuted_sets(s)
                     for s in range(NUM_FIXED_FILTER_SETS)])


@functools.lru_cache(maxsize=1)
def _inv_transpose() -> np.ndarray:
    """[4, 12] inverse tap permutations: diffs in coefficient space."""
    inv = np.empty((4, 12), np.int64)
    for t, perm in _TRANSPOSE_MAP.items():
        inv[t, perm] = np.arange(12)
    return inv


def tap_diffs(src: np.ndarray, ctu_size: int) -> np.ndarray:
    """[12, H, W] int32 symmetric tap differences of the 7x7 diamond,
    d_k = s(+dy,+dx) + s(-dy,-dx) - 2*cur, with the per-row virtual-
    boundary dy clamp of filterBlk (base tap order _TAPS7)."""
    H, W = src.shape
    p = np.pad(src.astype(np.int32), 3, mode="edge")
    ys = np.arange(H)
    xs = np.arange(W)
    vb = ctu_size - ALF_VB_POS_ABOVE
    yvb = ys & (ctu_size - 1)
    lim = np.full(H, 3, np.int64)
    m = (yvb >= vb - 4) & (yvb < vb)
    lim[m] = np.minimum(vb - 1 - yvb[m], 3)
    m = (yvb >= vb) & (yvb <= vb + 3)
    lim[m] = np.minimum(yvb[m] - vb, 3)
    cur = p[3:3 + H, 3:3 + W]
    D = np.empty((12, H, W), np.int32)
    for k, (dy, dx) in enumerate(_TAPS7):
        d = np.minimum(dy, lim)                  # all _TAPS7 dy >= 0
        s0 = p[(3 + ys + d)[:, None], 3 + xs[None, :] + dx]
        s1 = p[(3 + ys - d)[:, None], 3 + xs[None, :] - dx]
        D[k] = s0 + s1 - 2 * cur
    return D


def _pixel_maps(cls, tr, H, W):
    """Per-pixel class/transpose maps from the per-4x4 maps."""
    cm = np.repeat(np.repeat(cls, 4, 0), 4, 1)[:H, :W]
    tm = np.repeat(np.repeat(tr, 4, 0), 4, 1)[:H, :W]
    return cm, tm


def _row_shift(H, ctu_size):
    """Per-row right-shift (near-VB rows use SHIFT+3)."""
    ys = np.arange(H)
    yvb = ys & (ctu_size - 1)
    near = ((yvb >= ctu_size - ALF_VB_POS_ABOVE - 1)
            & (yvb <= ctu_size - ALF_VB_POS_ABOVE))
    return np.where(near, SHIFT + 3, SHIFT).astype(np.int64)


def filter_ctb(src: np.ndarray, dst: np.ndarray, x0: int, y0: int,
               ctu_size: int, cls: np.ndarray, tr: np.ndarray,
               set_idx: int, bit_depth: int):
    """Filter one luma CTB into dst (reads pre-ALF src)."""
    H, W = src.shape
    on = np.zeros(((H + ctu_size - 1) // ctu_size,
                   (W + ctu_size - 1) // ctu_size), bool)
    on[y0 // ctu_size, x0 // ctu_size] = True
    sets = np.full(on.shape, set_idx, np.int32)
    out = filter_frame(src, on, sets, cls, tr, ctu_size, bit_depth)
    y1, x1 = min(y0 + ctu_size, H), min(x0 + ctu_size, W)
    dst[y0:y1, x0:x1] = out[y0:y1, x0:x1]


def filter_frame(src: np.ndarray, ctb_on: np.ndarray,
                 ctb_set: np.ndarray, cls, tr, ctu_size: int,
                 bit_depth: int, D: np.ndarray | None = None,
                 aps_coeffs: np.ndarray | None = None) -> np.ndarray:
    """Whole-frame luma ALF -> filtered copy of src.

    ctb_set in [0, 16) selects a fixed set; 16 + k selects row k of
    aps_coeffs ([25, 12] per-class signalled coefficients, or
    [n, 25, 12] for several APS banks).
    """
    H, W = src.shape
    clip_hi = (1 << bit_depth) - 1
    if D is None:
        D = tap_diffs(src, ctu_size)
    cm, tm = _pixel_maps(cls, tr, H, W)
    setmap = np.repeat(np.repeat(ctb_set, ctu_size, 0), ctu_size,
                       1)[:H, :W]
    onmap = np.repeat(np.repeat(ctb_on, ctu_size, 0), ctu_size,
                      1)[:H, :W]
    bank = _all_permuted_sets()                     # [16, 4, 25, 12]
    if aps_coeffs is not None:
        # APS banks occupy set indices 16.. (filterSetIdx semantics of
        # codeAlfCtuFilterIndex, CABACWriter.cpp:3384)
        aps = np.asarray(aps_coeffs)
        if aps.ndim == 2:
            aps = aps[None]
        aps_perm = np.stack(
            [aps[:, :, _TRANSPOSE_MAP[t]] for t in range(4)],
            axis=1)                                 # [na, 4, 25, 12]
        bank = np.concatenate([bank, aps_perm], axis=0)
    coefs = bank[setmap, tm, cm]                    # [H, W, 12]
    acc = np.einsum("khw,hwk->hw", D.astype(np.int64),
                    coefs.astype(np.int64))
    sh = _row_shift(H, ctu_size)[:, None]
    val = src + ((acc + (1 << (sh - 1))) >> sh)
    out = np.where(onmap, np.clip(val, 0, clip_hi), src)
    return out.astype(src.dtype)


def apply_frame(recon: np.ndarray, ctb_on: np.ndarray,
                ctb_set: np.ndarray, cls, tr, ctu_size: int,
                bit_depth: int, aps_coeffs=None):
    """In-place luma ALF over the frame given per-CTB decisions."""
    if not ctb_on.any():
        return
    recon[:] = filter_frame(recon, ctb_on, ctb_set, cls, tr, ctu_size,
                            bit_depth, aps_coeffs=aps_coeffs)


def collect_stats(org: np.ndarray, recon: np.ndarray, cls, tr,
                  ctu_size: int, D: np.ndarray | None = None):
    """Per-(CTB, class) Wiener statistics in coefficient space
    (EncAdaptiveLoopFilter getBlkStats analogue):
      E [nry, nrx, 25, 12, 12]  sum of d_j d_k
      y [nry, nrx, 25, 12]      sum of d_j * (org - recon)
      pix [nry, nrx, 25]        sum of (org - recon)^2
    where d = transpose-permuted tap diffs, so any coefficient vector
    c (un-permuted, as signalled) scores
      ssd(c) ~= pix - 2^(1-SHIFT) c.y + 2^(-2 SHIFT) c^T E c.
    """
    H, W = org.shape
    if D is None:
        D = tap_diffs(recon, ctu_size)
    cm, tm = _pixel_maps(cls, tr, H, W)
    inv = _inv_transpose()[tm]                      # [H, W, 12]
    nry = (H + ctu_size - 1) // ctu_size
    nrx = (W + ctu_size - 1) // ctu_size
    ctb = (np.arange(H) // ctu_size)[:, None] * nrx \
        + (np.arange(W) // ctu_size)[None, :]
    gid = (ctb * NUM_CLASSES + cm).ravel()
    ngroups = nry * nrx * NUM_CLASSES
    e = (org.astype(np.int64) - recon).ravel().astype(np.float64)
    Dp = np.take_along_axis(D.transpose(1, 2, 0), inv,
                            axis=2).reshape(-1, 12).astype(np.float64)
    E = np.zeros((ngroups, 12, 12))
    y = np.zeros((ngroups, 12))
    for j in range(12):
        y[:, j] = np.bincount(gid, Dp[:, j] * e, minlength=ngroups)
        for k in range(j, 12):
            v = np.bincount(gid, Dp[:, j] * Dp[:, k],
                            minlength=ngroups)
            E[:, j, k] = v
            E[:, k, j] = v
    pix = np.bincount(gid, e * e, minlength=ngroups)
    return (E.reshape(nry, nrx, NUM_CLASSES, 12, 12),
            y.reshape(nry, nrx, NUM_CLASSES, 12),
            pix.reshape(nry, nrx, NUM_CLASSES))


def _set_costs(E, y, pix, coeffs):
    """Estimated per-CTB SSD for each candidate filter bank.
    coeffs: [S, 25, 12] -> [nry, nrx, S]."""
    f = np.asarray(coeffs, np.float64)
    t1 = np.einsum("rxcj,scj->rxs", y, f)
    t2 = np.einsum("rxcjk,scj,sck->rxs", E, f, f)
    inv = 1.0 / (1 << SHIFT)
    return pix.sum(axis=2)[:, :, None] - 2.0 * inv * t1 \
        + inv * inv * t2


# ---------------------------------------------------------------------
# adaptive (APS) luma filter derivation — EncAdaptiveLoopFilter
# deriveFilter/mergeClasses/deriveCoeffQuant analogue on the same stats

_FACTOR = 1 << SHIFT


def _wiener(E, y, pix):
    """Optimal unquantized filter + its error for summed stats."""
    reg = 1e-7 * max(float(np.trace(E)), 1.0)
    try:
        c = np.linalg.solve(E + reg * np.eye(12), y)
    except np.linalg.LinAlgError:            # pragma: no cover
        return np.zeros(12), float(pix)
    return c, float(pix - y @ c)


def _coeff_err(E, y, pix, ci):
    """Estimated SSD of integer coefficients ci (calcErrorForCoeffs)."""
    inv = 1.0 / _FACTOR
    return float(pix - 2.0 * inv * (ci @ y)
                 + inv * inv * (ci @ E @ ci))


def _quantize_filter(E, y, pix):
    """round + clamp + greedy +-1 refinement (deriveCoeffQuant,
    EncAdaptiveLoopFilter.cpp:1818-1878). -> (ci [12] int, err).

    The +-1 sweep scores all 12 single-coefficient moves at once via
    the exact rank-1 error delta
      err(ci + d e_k) - err(ci)
        = inv^2 (2 d (E ci)_k + d^2 E_kk) - 2 inv d y_k
    (one matvec instead of 12 full _coeff_err evaluations)."""
    c, _ = _wiener(E, y, pix)
    ci = np.round(c * _FACTOR).astype(np.int64)
    ci = np.clip(ci, -(_FACTOR - 1), _FACTOR - 1)
    inv = 1.0 / _FACTOR
    err = _coeff_err(E, y, pix, ci)
    diag = np.diag(E)
    for _ in range(3):
        improved = False
        for sign in (1, -1):
            d = -sign
            g = E @ ci
            delta = inv * inv * (2.0 * d * g + diag) - 2.0 * inv * d * y
            ok = np.abs(ci + d) <= _FACTOR - 1
            cand = np.where(ok, err + delta, np.inf)
            k = int(np.argmin(cand))
            if cand[k] < err:
                ci[k] += d
                err = _coeff_err(E, y, pix, ci)
                improved = True
        if not improved:
            break
    return ci, err


def _coeff_rate(ci):
    """alf_luma_coeff_abs uvlc + sign bits (alfFilter,
    VLCWriter.cpp:3043)."""
    bits = 0
    for v in ci:
        a = abs(int(v))
        bits += 2 * ((a + 1).bit_length() - 1) + 1 + (1 if a else 0)
    return bits


def derive_luma_aps(E, y, pix, lam):
    """Greedy class merging + per-merged-filter Wiener solve with
    RD-chosen filter count (mergeClasses / deriveFilterCoeffs
    analogue). E/y/pix: per-(CTB, class) stats.

    -> (coeff_table [nf, 12] int, filt_map [25], class_coeffs [25, 12])
    """
    Ec = E.sum(axis=(0, 1))                  # [25, 12, 12]
    yc = y.sum(axis=(0, 1))                  # [25, 12]
    pc = pix.sum(axis=(0, 1))                # [25]
    groups = [[c] for c in range(NUM_CLASSES)]
    gE = [Ec[c].copy() for c in range(NUM_CLASSES)]
    gy = [yc[c].copy() for c in range(NUM_CLASSES)]
    gp = [float(pc[c]) for c in range(NUM_CLASSES)]
    gerr = [_wiener(gE[c], gy[c], gp[c])[1]
            for c in range(NUM_CLASSES)]
    mappings = {}                            # nf -> filt_map [25]

    def snapshot():
        m = np.zeros(NUM_CLASSES, np.int64)
        for fi, grp in enumerate(groups):
            for c in grp:
                m[c] = fi
        mappings[len(groups)] = m

    snapshot()
    # agglomerative merge with cached pair errors: only pairs touching
    # the last-merged group are re-solved each round
    tokens = list(range(NUM_CLASSES))
    next_token = NUM_CLASSES
    pair = {}

    def pair_inc(a, b):
        key = (tokens[a], tokens[b])
        v = pair.get(key)
        if v is None:
            _, em = _wiener(gE[a] + gE[b], gy[a] + gy[b],
                            gp[a] + gp[b])
            v = (em - gerr[a] - gerr[b], em)
            pair[key] = v
        return v

    while len(groups) > 1:
        best = None
        for a in range(len(groups)):
            for b in range(a + 1, len(groups)):
                inc, em = pair_inc(a, b)
                if best is None or inc < best[0]:
                    best = (inc, a, b, em)
        _, a, b, em = best
        groups[a] += groups[b]
        gE[a] = gE[a] + gE[b]
        gy[a] = gy[a] + gy[b]
        gp[a] += gp[b]
        gerr[a] = em
        tokens[a] = next_token        # merged group: cache invalidates
        next_token += 1
        del groups[b], gE[b], gy[b], gp[b], gerr[b], tokens[b]
        snapshot()

    # choose the filter count: quantized whole-frame error + rate
    best = None
    for nf, fmap in mappings.items():
        mE = np.zeros((nf, 12, 12))
        my = np.zeros((nf, 12))
        mp = np.zeros(nf)
        for c in range(NUM_CLASSES):
            mE[fmap[c]] += Ec[c]
            my[fmap[c]] += yc[c]
            mp[fmap[c]] += pc[c]
        table = np.zeros((nf, 12), np.int64)
        dist = 0.0
        rate = 0
        for f in range(nf):
            table[f], e = _quantize_filter(mE[f], my[f], mp[f])
            dist += e
            rate += _coeff_rate(table[f])
        if nf > 1:
            rate += NUM_CLASSES * (nf - 1).bit_length()
        cost = dist + lam * rate
        if best is None or cost < best[0]:
            best = (cost, table, fmap)
    _, table, fmap = best
    return table, fmap, table[fmap]


def estimate_frame(org: np.ndarray, recon: np.ndarray, ctu_size: int,
                   bit_depth: int, lam: float, use_aps: bool = True):
    """Per-CTB choice among OFF, the 16 fixed sets and (optionally) a
    frame-derived APS filter bank, by estimated SSD + bits from the
    covariance statistics (no per-set filtering).

    -> (ctb_on [nry,nrx] bool, ctb_set int (16 = APS), cls, tr, aps)
    where aps is None or (coeff_table [nf,12], filt_map [25],
    class_coeffs [25,12]).
    """
    cls, tr = classify(recon, bit_depth, ctu_size)
    D = tap_diffs(recon, ctu_size)
    E, y, pix = collect_stats(org, recon, cls, tr, ctu_size, D=D)
    base = pix.sum(axis=2)
    banks = [np.asarray(fixed_filter_sets(), np.float64)]
    aps = None
    if use_aps:
        aps = derive_luma_aps(E, y, pix, lam)
        banks.append(aps[2][None].astype(np.float64))
    costs = _set_costs(E, y, pix, np.concatenate(banks, axis=0))
    # bit estimates: on+use_aps+tb16 for fixed, on+use_aps for APS
    costs[:, :, :NUM_FIXED_FILTER_SETS] += lam * 6.0
    if aps is not None:
        costs[:, :, NUM_FIXED_FILTER_SETS:] += lam * 3.0
    best = costs.argmin(axis=2)
    bestc = np.take_along_axis(costs, best[:, :, None],
                               axis=2)[:, :, 0]
    ctb_on = bestc < base + lam * 1.0
    ctb_set = np.where(ctb_on, best, 0).astype(np.int32)
    if aps is not None:
        used_aps = bool((ctb_set[ctb_on] >= NUM_FIXED_FILTER_SETS)
                        .any()) if ctb_on.any() else False
        if used_aps:
            # frame-level accept: APS rate must pay for itself
            aps_bits = sum(_coeff_rate(t) for t in aps[0]) \
                + NUM_CLASSES * max(1, (len(aps[0]) - 1).bit_length()) \
                + 60
            with_aps = np.where(ctb_on, bestc, base + lam).sum() \
                + lam * aps_bits
            no_aps_costs = costs[:, :, :NUM_FIXED_FILTER_SETS]
            nbest = no_aps_costs.min(axis=2)
            without = np.minimum(nbest, base + lam).sum()
            if without <= with_aps:
                used_aps = False
        if not used_aps:
            aps = None
            costs = costs[:, :, :NUM_FIXED_FILTER_SETS]
            best = costs.argmin(axis=2)
            bestc = np.take_along_axis(costs, best[:, :, None],
                                       axis=2)[:, :, 0]
            ctb_on = bestc < base + lam * 1.0
            ctb_set = np.where(ctb_on, best, 0).astype(np.int32)
    return ctb_on, ctb_set.astype(np.int32), cls, tr, aps


# ---------------------------------------------------------------------
# chroma ALF: 5x5 diamond, no classification/transpose, filters
# signalled in the APS (alf_chroma_new_filter), per-CTB enable flag +
# alternative index (AdaptiveLoopFilter filterBlk ALF_FILTER_5 paths)

_TAPS5 = [(2, 0), (1, 1), (1, 0), (1, -1), (0, 2), (0, 1)]


def tap_diffs_chroma(src: np.ndarray, ctu_size_c: int) -> np.ndarray:
    """[6, H, W] int32 symmetric 5x5-diamond tap differences with the
    chroma virtual-boundary clamp (vbPos = ctu_size_c - 2)."""
    H, W = src.shape
    p = np.pad(src.astype(np.int32), 2, mode="edge")
    ys = np.arange(H)
    xs = np.arange(W)
    vb = ctu_size_c - 2
    yvb = ys & (ctu_size_c - 1)
    lim = np.full(H, 2, np.int64)
    m = (yvb >= vb - 2) & (yvb < vb)
    lim[m] = np.minimum(vb - 1 - yvb[m], 2)
    m = (yvb >= vb) & (yvb <= vb + 1)
    lim[m] = np.minimum(yvb[m] - vb, 2)
    cur = p[2:2 + H, 2:2 + W]
    D = np.empty((6, H, W), np.int32)
    for k, (dy, dx) in enumerate(_TAPS5):
        d = np.minimum(dy, lim)
        s0 = p[(2 + ys + d)[:, None], 2 + xs[None, :] + dx]
        s1 = p[(2 + ys - d)[:, None], 2 + xs[None, :] - dx]
        D[k] = s0 + s1 - 2 * cur
    return D


def _row_shift_chroma(H, ctu_size_c):
    ys = np.arange(H)
    yvb = ys & (ctu_size_c - 1)
    near = (yvb == ctu_size_c - 3) | (yvb == ctu_size_c - 2)
    return np.where(near, SHIFT + 3, SHIFT).astype(np.int64)


def filter_frame_chroma(src: np.ndarray, ctb_on: np.ndarray,
                        ctb_alt: np.ndarray, coeffs: np.ndarray,
                        ctu_size_c: int, bit_depth: int,
                        D: np.ndarray | None = None) -> np.ndarray:
    """Whole-plane chroma ALF -> filtered copy.
    coeffs: [n_alt, 6] int; ctb_alt selects the alternative."""
    H, W = src.shape
    clip_hi = (1 << bit_depth) - 1
    if D is None:
        D = tap_diffs_chroma(src, ctu_size_c)
    altmap = np.repeat(np.repeat(ctb_alt, ctu_size_c, 0), ctu_size_c,
                       1)[:H, :W]
    onmap = np.repeat(np.repeat(ctb_on, ctu_size_c, 0), ctu_size_c,
                      1)[:H, :W]
    cf = np.asarray(coeffs, np.int64)[altmap]       # [H, W, 6]
    acc = np.einsum("khw,hwk->hw", D.astype(np.int64), cf)
    sh = _row_shift_chroma(H, ctu_size_c)[:, None]
    val = src + ((acc + (1 << (sh - 1))) >> sh)
    out = np.where(onmap, np.clip(val, 0, clip_hi), src)
    return out.astype(src.dtype)


def collect_stats_chroma(org: np.ndarray, recon: np.ndarray,
                         ctu_size_c: int,
                         D: np.ndarray | None = None):
    """Per-CTB chroma Wiener stats -> (E [nry,nrx,6,6], y [nry,nrx,6],
    pix [nry,nrx])."""
    H, W = org.shape
    if D is None:
        D = tap_diffs_chroma(recon, ctu_size_c)
    nry = (H + ctu_size_c - 1) // ctu_size_c
    nrx = (W + ctu_size_c - 1) // ctu_size_c
    ctb = (np.arange(H) // ctu_size_c)[:, None] * nrx \
        + (np.arange(W) // ctu_size_c)[None, :]
    gid = ctb.ravel()
    n = nry * nrx
    e = (org.astype(np.int64) - recon).ravel().astype(np.float64)
    Df = D.reshape(6, -1).astype(np.float64)
    E = np.zeros((n, 6, 6))
    y = np.zeros((n, 6))
    for j in range(6):
        y[:, j] = np.bincount(gid, Df[j] * e, minlength=n)
        for k in range(j, 6):
            v = np.bincount(gid, Df[j] * Df[k], minlength=n)
            E[:, j, k] = v
            E[:, k, j] = v
    pix = np.bincount(gid, e * e, minlength=n)
    return (E.reshape(nry, nrx, 6, 6), y.reshape(nry, nrx, 6),
            pix.reshape(nry, nrx))


def _wiener_n(E, y, pix):
    n = len(y)
    reg = 1e-7 * max(float(np.trace(E)), 1.0)
    try:
        c = np.linalg.solve(E + reg * np.eye(n), y)
    except np.linalg.LinAlgError:            # pragma: no cover
        return np.zeros(n), float(pix)
    return c, float(pix - y @ c)


def _quantize_filter_n(E, y, pix):
    """n-tap variant of _quantize_filter."""
    n = len(y)
    c, _ = _wiener_n(E, y, pix)
    ci = np.round(c * _FACTOR).astype(np.int64)
    ci = np.clip(ci, -(_FACTOR - 1), _FACTOR - 1)

    def err(v):
        inv = 1.0 / _FACTOR
        return float(pix - 2.0 * inv * (v @ y)
                     + inv * inv * (v @ E @ v))
    e0 = err(ci)
    for _ in range(3):
        improved = False
        for sign in (1, -1):
            bk, be = -1, e0
            for k in range(n):
                nv = ci[k] - sign
                if abs(nv) > _FACTOR - 1:
                    continue
                ci[k] = nv
                e2 = err(ci)
                ci[k] = nv + sign
                if e2 < be:
                    bk, be = k, e2
            if bk >= 0:
                ci[bk] -= sign
                e0 = be
                improved = True
        if not improved:
            break
    return ci, e0


def estimate_chroma(org_cb, rec_cb, org_cr, rec_cr, ctu_size_c: int,
                    bit_depth: int, lam: float):
    """Derive one chroma 5x5 filter (shared Cb/Cr alternative 0) and
    per-CTB on/off per component. -> None or
    (coeffs [1, 6], cb_on [nry,nrx] bool, cr_on [nry,nrx] bool)."""
    Eb, yb, pb = collect_stats_chroma(org_cb, rec_cb, ctu_size_c)
    Er, yr, pr = collect_stats_chroma(org_cr, rec_cr, ctu_size_c)
    E = Eb.sum(axis=(0, 1)) + Er.sum(axis=(0, 1))
    y = yb.sum(axis=(0, 1)) + yr.sum(axis=(0, 1))
    pix = float(pb.sum() + pr.sum())
    ci, _ = _quantize_filter_n(E, y, pix)
    if not ci.any():
        return None
    inv = 1.0 / _FACTOR

    def ctb_costs(Ec, yc):
        t1 = np.einsum("rxj,j->rx", yc, ci)
        t2 = np.einsum("rxjk,j,k->rx", Ec, ci, ci)
        return -2.0 * inv * t1 + inv * inv * t2     # delta vs off

    db = ctb_costs(Eb, yb)
    dr = ctb_costs(Er, yr)
    cb_on = db + lam * 2.0 < 0.0
    cr_on = dr + lam * 2.0 < 0.0
    gain = -(db[cb_on].sum() + dr[cr_on].sum())
    rate = sum(2 * ((abs(int(v)) + 1).bit_length() - 1) + 1
               + (1 if v else 0) for v in ci) + 20
    if gain <= lam * rate or not (cb_on.any() or cr_on.any()):
        return None
    return ci[None, :], cb_on, cr_on


def write_alf_ctu_chroma(enc, comp_idx: int, on_map: np.ndarray,
                         rx: int, ry: int, alt_map, num_alts: int):
    """codeAlfCtuEnableFlag(compIdx 1/2) + codeAlfCtuAlternatives
    (truncated-unary alternative index, ctbAlfAlternative ctx)."""
    from ..codec import ctx_ids
    left = bool(on_map[ry, rx - 1]) if rx > 0 else False
    above = bool(on_map[ry - 1, rx]) if ry > 0 else False
    ctx = (1 if left else 0) + (1 if above else 0)
    on = bool(on_map[ry, rx])
    enc.encode_bin(1 if on else 0,
                   ctx_ids.ctbAlfFlag[0] + comp_idx * 3 + ctx)
    if on:
        alt = 0 if alt_map is None else int(alt_map[ry, rx])
        for d in range(num_alts - 1):
            bit = 1 if alt > d else 0
            enc.encode_bin(bit, ctx_ids.ctbAlfAlternative[0]
                           + comp_idx - 1)
            if not bit:
                break


# ---------------------------------------------------------------------
# CC-ALF: cross-component correction of chroma from a 7-tap high-pass
# of the co-located (pre-ALF, post-SAO) luma (filterBlkCcAlf parity,
# AdaptiveLoopFilter.cpp; 4:2:0 only). Coefficients are powers of two
# with |c| <= 64 (CCALF_DYNAMIC_RANGE 6), scale bits 7.

_CC_TAPS = [(-1, 0), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1), (2, 0)]
_CC_LEVELS = np.asarray([0, 1, 2, 4, 8, 16, 32, 64], np.int64)


def cc_tap_diffs(luma: np.ndarray, ctu_size: int, hc: int,
                 wc: int) -> np.ndarray:
    """[7, hc, wc] int32 luma cross diffs at chroma positions
    (4:2:0 co-location 2cy, 2cx), with the CC-ALF virtual-boundary
    row-offset clamps."""
    p = np.pad(luma.astype(np.int32), 2, mode="edge")
    ly = 2 * np.arange(hc)
    lx = 2 * np.arange(wc)
    vb = ctu_size - ALF_VB_POS_ABOVE
    pos = ly & (ctu_size - 1)
    clamp_all = (pos == vb - 1) | (pos == vb)       # offsets 1/2/3 -> 0
    clamp3 = (pos == vb - 2) | (pos == vb + 1)      # offset3 -> offset1
    cur = p[(2 + ly)[:, None], (2 + lx)[None, :]]
    D = np.empty((7, hc, wc), np.int32)
    for k, (dy, dx) in enumerate(_CC_TAPS):
        d = np.full(hc, dy, np.int64)
        if dy == 2:
            d = np.where(clamp3, 1, d)
        if dy != 0:
            d = np.where(clamp_all, 0, d)
        s = p[(2 + ly + d)[:, None], (2 + lx + dx)[None, :]]
        D[k] = s - cur
    return D


def cc_filter_plane(chroma: np.ndarray, D: np.ndarray,
                    ctb_on: np.ndarray, coeff: np.ndarray,
                    ctu_size_c: int, bit_depth: int) -> np.ndarray:
    """Apply one CC-ALF filter where ctb_on -> corrected copy."""
    H, W = chroma.shape
    clip_hi = (1 << bit_depth) - 1
    half = 1 << bit_depth >> 1
    acc = np.einsum("khw,k->hw", D.astype(np.int64),
                    np.asarray(coeff, np.int64))
    corr = (acc + 64) >> 7                           # m_scaleBits = 7
    corr = np.clip(corr + half, 0, clip_hi) - half
    onmap = np.repeat(np.repeat(ctb_on, ctu_size_c, 0), ctu_size_c,
                      1)[:H, :W]
    out = np.where(onmap, np.clip(chroma + corr, 0, clip_hi), chroma)
    return out.astype(chroma.dtype)


def _cc_stats(D, err, ctu_size_c):
    hc, wc = err.shape
    nry = (hc + ctu_size_c - 1) // ctu_size_c
    nrx = (wc + ctu_size_c - 1) // ctu_size_c
    ctb = (np.arange(hc) // ctu_size_c)[:, None] * nrx \
        + (np.arange(wc) // ctu_size_c)[None, :]
    gid = ctb.ravel()
    n = nry * nrx
    e = err.ravel().astype(np.float64)
    Df = D.reshape(7, -1).astype(np.float64)
    E = np.zeros((n, 7, 7))
    y = np.zeros((n, 7))
    for j in range(7):
        y[:, j] = np.bincount(gid, Df[j] * e, minlength=n)
        for k in range(j, 7):
            v = np.bincount(gid, Df[j] * Df[k], minlength=n)
            E[:, j, k] = v
            E[:, k, j] = v
    return E.reshape(nry, nrx, 7, 7), y.reshape(nry, nrx, 7)


def _cc_quantize(E, y):
    """Power-of-two coefficient quantization (roundFiltCoeffCCALF
    analogue) + greedy coordinate refinement over the level set."""
    c, _ = _wiener_n(E, y, 0.0)
    ci = np.zeros(7, np.int64)
    for k in range(7):
        v = c[k] * 128.0
        lev = _CC_LEVELS[np.argmin(np.abs(_CC_LEVELS - abs(v)))]
        ci[k] = lev if v >= 0 else -lev

    def err(v):
        inv = 1.0 / 128.0
        return float(-2.0 * inv * (v @ y) + inv * inv * (v @ E @ v))
    e0 = err(ci)
    for _ in range(2):
        improved = False
        for k in range(7):
            best = (e0, ci[k])
            for lev in _CC_LEVELS:
                for s in (lev, -lev):
                    old = ci[k]
                    ci[k] = s
                    e2 = err(ci)
                    ci[k] = old
                    if e2 < best[0]:
                        best = (e2, s)
            if best[1] != ci[k]:
                ci[k] = best[1]
                e0 = best[0]
                improved = True
        if not improved:
            break
    return ci, e0


def estimate_ccalf(luma_pre_alf: np.ndarray, org_c, rec_c,
                   ctu_size: int, bit_depth: int, lam: float):
    """Derive one CC-ALF filter for a chroma component + per-CTB
    on/off. rec_c: chroma AFTER chroma ALF. -> None or
    (coeff [7] int, ctb_on bool map, D)."""
    hc, wc = org_c.shape
    D = cc_tap_diffs(luma_pre_alf, ctu_size, hc, wc)
    err = org_c.astype(np.int64) - rec_c
    E, y = _cc_stats(D, err, ctu_size // 2)
    ci, _ = _cc_quantize(E.sum(axis=(0, 1)), y.sum(axis=(0, 1)))
    if not ci.any():
        return None
    inv = 1.0 / 128.0
    t1 = np.einsum("rxj,j->rx", y, ci)
    t2 = np.einsum("rxjk,j,k->rx", E, ci, ci)
    delta = -2.0 * inv * t1 + inv * inv * t2
    ctb_on = delta + lam * 2.0 < 0.0
    if not ctb_on.any():
        return None
    gain = -delta[ctb_on].sum()
    rate = 7 * 4 + 30
    if gain <= lam * rate:
        return None
    return ci, ctb_on, D


def write_ccalf_ctu(enc, comp_idx: int, on_map: np.ndarray, rx: int,
                    ry: int, filter_count: int = 1):
    """codeCcAlfFilterControlIdc (CABACWriter.cpp): ctx from left/
    above idc != 0 plus +3 for Cr; EP unary filter index."""
    from ..codec import ctx_ids
    left = bool(on_map[ry, rx - 1]) if rx > 0 else False
    above = bool(on_map[ry - 1, rx]) if ry > 0 else False
    ctx = (1 if left else 0) + (1 if above else 0) \
        + (3 if comp_idx == 2 else 0)
    on = bool(on_map[ry, rx])
    enc.encode_bin(1 if on else 0,
                   ctx_ids.CcAlfFilterControlFlag[0] + ctx)
    if on and filter_count > 1:                      # pragma: no cover
        enc.encode_bin_ep(0)


# ---------------------------------------------------------------------
# CTU syntax (written after sao(), before the coding tree)

def write_alf_ctu(enc, ctb_on: np.ndarray, rx: int, ry: int,
                  ctb_set: np.ndarray, chroma: bool,
                  num_aps: int = 0):
    """codeAlfCtuEnableFlag (luma) + codeAlfCtuFilterIndex
    (CABACWriter.cpp:3263, :3384): with APS present, one
    AlfUseTemporalFilt bin selects APS (>= 16) vs fixed sets; the APS
    index is truncated-binary only when num_aps > 1."""
    from ..codec import ctx_ids
    from ..codec.encoder import write_trunc_bin
    left = bool(ctb_on[ry, rx - 1]) if rx > 0 else False
    above = bool(ctb_on[ry - 1, rx]) if ry > 0 else False
    ctx = (1 if left else 0) + (1 if above else 0)
    on = bool(ctb_on[ry, rx])
    enc.encode_bin(1 if on else 0, ctx_ids.ctbAlfFlag[0] + 0 * 3 + ctx)
    if on:
        si = int(ctb_set[ry, rx])
        if num_aps > 0:
            use_aps = si >= NUM_FIXED_FILTER_SETS
            enc.encode_bin(1 if use_aps else 0,
                           ctx_ids.AlfUseTemporalFilt[0])
            if use_aps:
                if num_aps > 1:
                    write_trunc_bin(enc, si - NUM_FIXED_FILTER_SETS,
                                    num_aps)
            else:
                write_trunc_bin(enc, si, NUM_FIXED_FILTER_SETS)
        else:
            write_trunc_bin(enc, si, NUM_FIXED_FILTER_SETS)
