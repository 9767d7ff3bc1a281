"""Adaptive Loop Filter (luma, fixed filter sets — no APS needed).

Behavioral parity: CommonLib/AdaptiveLoopFilter.cpp —
deriveClassificationBlk (:848: subsampled Laplacians, activity
quantization, directionality/transpose), filterBlk<ALF_FILTER_7>
(:1059: 7x7 diamond, virtual-boundary tap clipping, near-VB shift),
fixed filter construction (:772: m_classToFilterMapping x
m_fixedFilterSetCoeff, clip = full range -> linear). CTU syntax:
CABACWriter codeAlfCtuEnableFlag (:3263) + codeAlfCtuFilterIndex
(:3384, truncated binary over the 16 fixed sets when no APS).

Scope: luma only, the 16 predefined filter sets (VVC allows a slice
with sh_num_alf_aps_ids_luma = 0 where every ALF-on CTB picks a fixed
set) — APS-coded filters and chroma ALF are the next increment.
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
    (deriveClassificationBlk parity, whole picture at once)."""
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
    for gi, yy in enumerate(ys):         # yy = reference's y (center)
        if yy > 0 and (yy & (ctu_size - 1)) == vb_pos - 2:
            # src3 := src2 (pair's lower row +2 clamped to +1)
            ver[gi] = (np.abs(c[gi] - g(-1, 0)[gi] - g(1, 0)[gi])
                       + np.abs(up1[gi] - g(0, 1)[gi] - g(1, 1)[gi]))
            d0[gi] = (np.abs(c[gi] - g(-1, -1)[gi] - g(1, 1)[gi])
                      + np.abs(up1[gi] - g(0, 0)[gi] - g(1, 2)[gi]))
            d1[gi] = (np.abs(c[gi] - g(1, -1)[gi] - g(-1, 1)[gi])
                      + np.abs(up1[gi] - g(1, 0)[gi] - g(0, 2)[gi]))
        elif yy > 0 and (yy & (ctu_size - 1)) == vb_pos:
            # src0 := src1 (upper neighbor row clamps to the centre)
            ver[gi] = (np.abs(c[gi] - g(0, 0)[gi] - g(1, 0)[gi])
                       + np.abs(up1[gi] - g(0, 1)[gi] - g(2, 1)[gi]))
            d0[gi] = (np.abs(c[gi] - g(0, -1)[gi] - g(1, 1)[gi])
                      + np.abs(up1[gi] - g(0, 0)[gi] - g(2, 2)[gi]))
            d1[gi] = (np.abs(c[gi] - g(1, -1)[gi] - g(0, 1)[gi])
                      + np.abs(up1[gi] - g(2, 0)[gi] - g(0, 2)[gi]))

    nby, nbx = H // 4, W // 4
    cls = np.zeros((nby, nbx), np.int32)
    tr = np.zeros((nby, nbx), np.int32)
    # per-4x4: sum the 4x4 lattice of gradients covering 8x8 support:
    # grid rows 2i.. hold y = 4*by-2 + {0,2,4,6}
    for by in range(nby):
        gy = 2 * by                    # ys index of y = 4*by-2
        ybase = 4 * by
        yin = ybase & (ctu_size - 1)
        if yin == vb_pos - 4:
            rows = (gy, gy + 1, gy + 2)
        elif yin == vb_pos:
            rows = (gy + 1, gy + 2, gy + 3)
        else:
            rows = (gy, gy + 1, gy + 2, gy + 3)
        for bx in range(nbx):
            gx = 2 * bx
            cols = (gx, gx + 1, gx + 2, gx + 3)
            sv = sh = s0 = s1 = 0
            for r in rows:
                for cix in cols:
                    sv += int(ver[r, cix])
                    sh += int(hor[r, cix])
                    s0 += int(d0[r, cix])
                    s1 += int(d1[r, cix])
            temp_act = sv + sh
            mult = 96 if yin in (vb_pos - 4, vb_pos) else 64
            activity = min(max((temp_act * mult) >> shift, 0), 15)
            class_idx = int(_ACT_TH[activity])

            if sv > sh:
                hv1, hv0, dir_hv = sv, sh, 1
            else:
                hv1, hv0, dir_hv = sh, sv, 3
            if s0 > s1:
                dd1, dd0, dir_d = s0, s1, 0
            else:
                dd1, dd0, dir_d = s1, s0, 2
            if dd1 * hv0 > hv1 * dd0:
                hvd1, hvd0 = dd1, dd0
                main_dir, sec_dir = dir_d, dir_hv
            else:
                hvd1, hvd0 = hv1, hv0
                main_dir, sec_dir = dir_hv, dir_d
            strength = 0
            if hvd1 > 2 * hvd0:
                strength = 1
            if hvd1 * 2 > 9 * hvd0:
                strength = 2
            if strength:
                class_idx += (((main_dir & 1) << 1) + strength) * 5
            cls[by, bx] = class_idx
            tr[by, bx] = int(_TRANSPOSE_TAB[main_dir * 2 + (sec_dir >> 1)])
    return cls, tr


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


def filter_ctb(src: np.ndarray, dst: np.ndarray, x0: int, y0: int,
               ctu_size: int, cls: np.ndarray, tr: np.ndarray,
               set_idx: int, bit_depth: int):
    """Filter one luma CTB into dst (reads pre-ALF src). Vectorized:
    per-pixel coefficient planes from the class/transpose maps, one
    shifted-add per tap, per-row dy clamp for the 8 VB rows."""
    H, W = src.shape
    clip_hi = (1 << bit_depth) - 1
    p = np.pad(src.astype(np.int64), 3, mode="edge")
    y1, x1 = min(y0 + ctu_size, H), min(x0 + ctu_size, W)
    bh, bw = y1 - y0, x1 - x0

    csl = np.s_[y0 // 4:(y0 + bh + 3) // 4, x0 // 4:(x0 + bw + 3) // 4]
    cblk = np.repeat(np.repeat(cls[csl], 4, 0), 4, 1)[:bh, :bw]
    tblk = np.repeat(np.repeat(tr[csl], 4, 0), 4, 1)[:bh, :bw]
    coefs = _permuted_sets(set_idx)[tblk, cblk]     # [bh, bw, 12]

    ys = np.arange(y0, y1)
    dyc = np.empty((bh, 12), np.int64)
    for k, (dy, _) in enumerate(_TAPS7):
        dyc[:, k] = [_clamped_dy(dy, int(y), ctu_size) for y in ys]

    cur = p[3 + y0:3 + y1, 3 + x0:3 + x1]
    acc = np.zeros((bh, bw), np.int64)
    # group rows by their clamp vector (at most 9 distinct groups)
    row_keys = [tuple(dyc[i]) for i in range(bh)]
    for key in set(row_keys):
        rows = np.asarray([i for i in range(bh) if row_keys[i] == key])
        yy = ys[rows]
        xsl = np.arange(x0, x1)
        for k, (dy, dx) in enumerate(_TAPS7):
            d = key[k]
            s0 = p[3 + yy[:, None] + d, 3 + xsl[None, :] + dx]
            s1 = p[3 + yy[:, None] - d, 3 + xsl[None, :] - dx]
            acc[rows] += coefs[rows, :, k] * (s0 + s1 - 2 * cur[rows])

    yvb = ys & (ctu_size - 1)
    near = ((yvb >= ctu_size - ALF_VB_POS_ABOVE - 1)
            & (yvb <= ctu_size - ALF_VB_POS_ABOVE))
    sh = np.where(near, SHIFT + 3, SHIFT)[:, None]
    off = (1 << (sh - 1))
    val = cur + ((acc + off) >> sh)
    dst[y0:y1, x0:x1] = np.clip(val, 0, clip_hi)


def apply_frame(recon: np.ndarray, ctb_on: np.ndarray,
                ctb_set: np.ndarray, cls, tr, ctu_size: int,
                bit_depth: int):
    """In-place luma ALF over the frame given per-CTB decisions."""
    src = recon.copy()
    nry, nrx = ctb_on.shape
    for ry in range(nry):
        for rx in range(nrx):
            if ctb_on[ry, rx]:
                filter_ctb(src, recon, rx * ctu_size, ry * ctu_size,
                           ctu_size, cls, tr, int(ctb_set[ry, rx]),
                           bit_depth)


def estimate_frame(org: np.ndarray, recon: np.ndarray, ctu_size: int,
                   bit_depth: int, lam: float):
    """Per-CTB choice among OFF and the 16 fixed sets by SSD + bits.
    -> (ctb_on [nry,nrx] bool, ctb_set int, cls, tr)."""
    H, W = org.shape
    cls, tr = classify(recon, bit_depth, ctu_size)
    nry = (H + ctu_size - 1) // ctu_size
    nrx = (W + ctu_size - 1) // ctu_size
    ctb_on = np.zeros((nry, nrx), bool)
    ctb_set = np.zeros((nry, nrx), np.int32)
    scratch = recon.copy()
    for ry in range(nry):
        for rx in range(nrx):
            y0, x0 = ry * ctu_size, rx * ctu_size
            y1, x1 = min(y0 + ctu_size, H), min(x0 + ctu_size, W)
            o = org[y0:y1, x0:x1].astype(np.int64)
            base = float(((o - recon[y0:y1, x0:x1]) ** 2).sum())
            best = (base + lam * 1.0, False, 0)
            for s in range(NUM_FIXED_FILTER_SETS):
                filter_ctb(recon, scratch, x0, y0, ctu_size, cls, tr,
                           s, bit_depth)
                d = float(((o - scratch[y0:y1, x0:x1]) ** 2).sum())
                cost = d + lam * 5.0
                if cost < best[0]:
                    best = (cost, True, s)
            ctb_on[ry, rx] = best[1]
            ctb_set[ry, rx] = best[2]
    return ctb_on, ctb_set, cls, tr


# ---------------------------------------------------------------------
# CTU syntax (written after sao(), before the coding tree)

def write_alf_ctu(enc, ctb_on: np.ndarray, rx: int, ry: int,
                  ctb_set: np.ndarray, chroma: bool):
    """codeAlfCtuEnableFlag (luma; chroma slice-disabled -> nothing) +
    codeAlfCtuFilterIndex with 0 APS (fixed sets, truncated binary)."""
    from ..codec import ctx_ids
    from ..codec.encoder import write_trunc_bin
    left = bool(ctb_on[ry, rx - 1]) if rx > 0 else False
    above = bool(ctb_on[ry - 1, rx]) if ry > 0 else False
    ctx = (1 if left else 0) + (1 if above else 0)
    on = bool(ctb_on[ry, rx])
    enc.encode_bin(1 if on else 0, ctx_ids.ctbAlfFlag[0] + 0 * 3 + ctx)
    if on:
        write_trunc_bin(enc, int(ctb_set[ry, rx]),
                        NUM_FIXED_FILTER_SETS)
