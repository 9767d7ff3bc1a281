"""NumPy twin of ops.transforms / ops.quant for the sequential
(host-side) encoder path — identical integer math without per-op device
dispatch. The JAX versions remain the batched/TPU path; equality is
enforced by tests."""

from __future__ import annotations

import numpy as np

from . import rom
from .transforms import (DCT2, DCT8, DST7, _KIND_NAME, _keep,
                         MAX_LOG2_TR_DYNAMIC_RANGE, TR_MAT_SHIFT)


def _core(kind: int, size: int) -> np.ndarray:
    return rom.trans_matrix(_KIND_NAME[kind], size).astype(np.int64)


def _rshift_round(x, shift):
    if shift <= 0:
        return x
    return (x + (1 << (shift - 1))) >> shift


def fwd_transform_2d(resi: np.ndarray, kind_h: int = DCT2,
                     kind_v: int = DCT2, bit_depth: int = 10) -> np.ndarray:
    H, W = resi.shape[-2], resi.shape[-1]
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    s1 = log2w + bit_depth + TR_MAT_SHIFT - MAX_LOG2_TR_DYNAMIC_RANGE
    s2 = log2h + TR_MAT_SHIFT
    kw, kh = _keep(kind_h, W), _keep(kind_v, H)
    Tw = _core(kind_h, W)[:kw]
    Tv = _core(kind_v, H)[:kh]
    a = _rshift_round(resi.astype(np.int64) @ Tw.T, s1)
    c = _rshift_round(np.einsum("vj,...jk->...vk", Tv, a), s2)
    out = np.zeros(resi.shape[:-2] + (H, W), np.int32)
    out[..., :kh, :kw] = c
    return out


def inv_transform_2d(coeff: np.ndarray, kind_h: int = DCT2,
                     kind_v: int = DCT2, bit_depth: int = 10) -> np.ndarray:
    H, W = coeff.shape[-2], coeff.shape[-1]
    s1 = TR_MAT_SHIFT + 1
    s2 = TR_MAT_SHIFT + MAX_LOG2_TR_DYNAMIC_RANGE - 1 - bit_depth
    lo, hi = -(1 << MAX_LOG2_TR_DYNAMIC_RANGE), (1 << MAX_LOG2_TR_DYNAMIC_RANGE) - 1
    kw, kh = _keep(kind_h, W), _keep(kind_v, H)
    Tw = _core(kind_h, W)[:kw]
    Tv = _core(kind_v, H)[:kh]
    c = coeff.astype(np.int64)[..., :kh, :kw]
    b = np.clip(_rshift_round(np.einsum("vj,...vu->...ju", Tv, c), s1), lo, hi)
    r = _rshift_round(b @ Tw, s2)
    return np.clip(r, -32768, 32767).astype(np.int32)


def quant(coeff: np.ndarray, qp: int, bit_depth: int = 10,
          is_irap: bool = False, transform_skip: bool = False) -> np.ndarray:
    from .quant import (QUANT_SHIFT, _COEFF_MIN, _COEFF_MAX,
                        transform_shift, _needs_sqrt2)
    H, W = coeff.shape[-2], coeff.shape[-1]
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    sqrt_adj = _needs_sqrt2(log2w, log2h) and not transform_skip
    per, rem = qp // 6, qp % 6
    scale = int(np.asarray(rom.quant_scales())[1 if sqrt_adj else 0][rem])
    tshift = transform_shift(bit_depth, log2w, log2h) - (1 if sqrt_adj else 0)
    iqbits = QUANT_SHIFT + per + (0 if transform_skip else tshift)
    iadd = (171 if is_irap else 85) << (iqbits - 9)
    c = coeff.astype(np.int64)
    mag = (np.abs(c) * scale + iadd) >> iqbits
    q = np.sign(c) * mag
    return np.clip(q, _COEFF_MIN, _COEFF_MAX).astype(np.int32)


def dequant(qcoeff: np.ndarray, qp: int, bit_depth: int = 10,
            transform_skip: bool = False) -> np.ndarray:
    from .quant import (IQUANT_SHIFT, _COEFF_MIN, _COEFF_MAX,
                        transform_shift, _needs_sqrt2)
    H, W = qcoeff.shape[-2], qcoeff.shape[-1]
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    sqrt_adj = _needs_sqrt2(log2w, log2h) and not transform_skip
    per, rem = qp // 6, qp % 6
    scale = int(np.asarray(rom.inv_quant_scales())[1 if sqrt_adj else 0][rem])
    tshift = transform_shift(bit_depth, log2w, log2h) - (1 if sqrt_adj else 0)
    right_shift = IQUANT_SHIFT - ((0 if transform_skip else tshift) + per)
    c = np.clip(qcoeff.astype(np.int64), -32768, 32767)
    if right_shift > 0:
        dq = (c * scale + (1 << (right_shift - 1))) >> right_shift
    else:
        dq = (c * scale) << (-right_shift)
    return np.clip(dq, _COEFF_MIN, _COEFF_MAX).astype(np.int32)
