"""LFNST (low-frequency non-separable secondary transform) —
normative, spec §8.7.4.3.

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/TrQuant.cpp —
xFwdLfnst (:421; region gather with transpose variant, top-left diag
spectral rearrangement), fwdLfnstNxN (:247; (c+64)>>7 int8 matmul,
zeroOutSize 8 for 4x4/8x8 TUs else 16), invLfnstNxN (:271),
getLFNSTIntraMode (:296), getTransposeFlag (:316); xT primary-
transform zero-out under LFNST (:~560: keep 8x8, or 4x4 for 4xN/Nx4);
RomLFNST.cpp kernels via tools/gen_lfnst.py."""

from __future__ import annotations

import functools
import os

import numpy as np

from . import rom

VDIA_IDX = 66
NUM_LUMA_MODE = 67
EXT_HALF = 14               # NUM_EXT_LUMA_MODE >> 1


@functools.lru_cache(maxsize=1)
def _data():
    d = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "lfnst.npz"))
    return d["lut"], d["m4"].astype(np.int64), d["m8"].astype(np.int64)


def wide_angle(mode: int, w: int, h: int) -> int:
    """PU::getWideAngle (UnitTools.cpp:3890) — the LFNST variant of
    the wide-angle remap: h>w maps to NEGATIVE indices (mode - 67),
    unlike the prediction-side getModifiedWideAngle (mode - 65)."""
    if mode < 2:
        return mode
    shift = (0, 6, 10, 12, 14, 15)
    delta = abs((w.bit_length() - 1) - (h.bit_length() - 1))
    if w > h and mode < 2 + shift[delta]:
        return mode + (VDIA_IDX - 1)
    if h > w and mode > VDIA_IDX - shift[delta]:
        return mode - (VDIA_IDX + 1)
    return mode


def lfnst_set(wide_ang_mode: int) -> tuple[int, bool]:
    """(set index, transpose flag) from the wide-angle-mapped intra
    mode (getLFNSTIntraMode + getTransposeFlag + g_lfnstLut)."""
    m = wide_ang_mode
    if m < 0:
        ext = m + EXT_HALF + NUM_LUMA_MODE
    elif m >= NUM_LUMA_MODE:
        ext = m + EXT_HALF
    else:
        ext = m
    lut, _, _ = _data()
    transpose = (ext >= NUM_LUMA_MODE + EXT_HALF) or \
        (ext < NUM_LUMA_MODE and ext > 34)
    return int(lut[ext]), transpose


def _region_gather(blk: np.ndarray, sb: int) -> np.ndarray:
    """Forward input gather: top-left 8x8 minus bottom-right 4x4 (48)
    or top-left 4x4 (16), row-major."""
    if sb == 4:
        return blk[:4, :4].reshape(-1)
    parts = [blk[y, :8] if y < 4 else blk[y, :4] for y in range(8)]
    return np.concatenate(parts)


def _region_scatter(vals: np.ndarray, blk: np.ndarray, sb: int):
    """Inverse of _region_gather (in place into blk)."""
    if sb == 4:
        blk[:4, :4] = vals.reshape(4, 4)
        return
    off = 0
    for y in range(8):
        n = 8 if y < 4 else 4
        blk[y, :n] = vals[off:off + n]
        off += n


def _scan_positions(w: int, h: int, sb: int):
    """Spectral rearrangement positions (g_coefTopLeftDiagScan8x8 is
    CG-grouped: entries 0..15 are the top-left 4x4 in diag order, so
    for both sub-block sizes the <=16 live outputs land on the
    top-left 4x4 diag scan)."""
    s = rom.scan_diag(4, 4)[:16]
    return s[:, 0], s[:, 1]         # (xs, ys)


def sb_size(w: int, h: int) -> int:
    return 8 if (w >= 8 and h >= 8) else 4


def zero_out_size(w: int, h: int) -> int:
    return 8 if ((w == 4 and h == 4) or (w == 8 and h == 8)) else 16


def primary_keep(w: int, h: int) -> tuple[int, int]:
    """Primary-transform retained low-freq region under LFNST (xT
    skipWidth/Height)."""
    if (w == 4 and h > 4) or (w > 4 and h == 4):
        return 4, 4
    if w >= 8 and h >= 8:
        return 8, 8
    return w, h


def fwd(coeff: np.ndarray, set_idx: int, lfnst_idx: int,
        transpose: bool) -> np.ndarray:
    """Forward LFNST on a primary-coefficient block (already zeroed
    outside primary_keep). -> new coefficient block."""
    h, w = coeff.shape
    sb = sb_size(w, h)
    lut_unused, m4, m8 = _data()
    mat = (m8 if sb == 8 else m4)[set_idx][lfnst_idx - 1]
    src = coeff.T if transpose else coeff
    inp = _region_gather(src, sb).astype(np.int64)
    zo = zero_out_size(w, h)
    out_v = (mat[:zo] @ inp + 64) >> 7
    out = np.zeros_like(coeff)
    xs, ys = _scan_positions(w, h, sb)
    out[ys[:zo], xs[:zo]] = out_v
    return out


def inv(coeff: np.ndarray, set_idx: int, lfnst_idx: int,
        transpose: bool, max_log2_dyn: int = 15) -> np.ndarray:
    """Inverse LFNST (the decoder side; invLfnstNxN + scatter)."""
    h, w = coeff.shape
    sb = sb_size(w, h)
    _, m4, m8 = _data()
    mat = (m8 if sb == 8 else m4)[set_idx][lfnst_idx - 1]
    zo = zero_out_size(w, h)
    xs, ys = _scan_positions(w, h, sb)
    src = coeff[ys[:zo], xs[:zo]].astype(np.int64)
    lo, hi = -(1 << max_log2_dyn), (1 << max_log2_dyn) - 1
    res = np.clip((src @ mat[:zo] + 64) >> 7, lo, hi)
    out = np.zeros_like(coeff)
    if transpose:
        tmp = np.zeros((w, h), coeff.dtype)
        _region_scatter(res, tmp, sb)
        out[:, :] = tmp.T
    else:
        _region_scatter(res, out, sb)
    return out
