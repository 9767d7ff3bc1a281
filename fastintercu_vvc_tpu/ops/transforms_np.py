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


def quant_dep(coeff: np.ndarray, qp: int, bit_depth: int = 10,
              is_irap: bool = False) -> np.ndarray:
    """Dependent quantization, greedy state-following quantizer (the
    encoder side is non-normative; VTM uses a trellis, DepQuant.cpp:
    1574). Each coefficient rounds to the nearest admissible level of
    the current state's quantizer with the same deadzone offset as the
    scalar quantizer, walking the scan from the last significant
    position exactly as the decoder does."""
    from .quant import QUANT_SHIFT, transform_shift, _needs_sqrt2
    H, W = coeff.shape
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    sqrt_adj = _needs_sqrt2(log2w, log2h)
    qp_dq = qp + 1
    per, rem = qp_dq // 6, qp_dq % 6
    scale = int(np.asarray(rom.quant_scales())[1 if sqrt_adj else 0][rem])
    tshift = transform_shift(bit_depth, log2w, log2h) - (1 if sqrt_adj else 0)
    qshift = QUANT_SHIFT - 1 + per + tshift
    step = 1 << qshift                     # half-step of the QP+1 grid

    scan = rom.scan_diag(W, H)
    c = coeff.astype(np.int64)
    qf = np.abs(c) * scale                 # scaled magnitudes
    sgn = np.sign(c)

    # rate-distortion level decision (the trellis's role, scalarized):
    # distortion in pixel-domain units via the inverse transform gain,
    # rate ~ level-coding bins; lambda from the QP (encoder side is
    # non-normative so float math is fine here)
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    err_norm = 1.0 / (float(scale) ** 2 * 2.0 ** (2 * tshift))

    def level_cost(target, qidx, lv):
        e = float(target - qidx * step)
        rate = 0.0 if lv == 0 else 1.5 + 2.0 * np.log2(lv + 1.0)
        return e * e * err_norm + lam * rate

    vals = qf[scan[:, 1], scan[:, 0]]
    q = np.zeros((H, W), np.int32)

    from .. import native
    if native.get_lib() is not None:
        # exact 4-state Viterbi over the scan (depquant.c — the
        # DepQuant.cpp:855-1574 trellis role)
        sg = sgn[scan[:, 1], scan[:, 0]].astype(np.int32)
        levels = native.dq_trellis(vals, sg, step, qshift,
                                   err_norm, lam)
        q[scan[:, 1], scan[:, 0]] = levels
        return q

    # pure-python fallback: greedy state follower
    nz = np.nonzero(vals * 2 >= 2 * step)[0]
    # trim: last = highest position whose RD cost prefers a nonzero
    # level at state 0
    last = -1
    for pos in nz[::-1]:
        t = int(vals[pos])
        if level_cost(t, 2, 1) < level_cost(t, 0, 0):
            last = int(pos)
            break
    if last < 0:
        return q

    state = 0
    for pos in range(last, -1, -1):
        x, y = int(scan[pos, 0]), int(scan[pos, 1])
        p = state >> 1
        target = int(qf[y, x])
        lr = (target + p * step + step) >> (qshift + 1)   # nearest
        best_l, best_c = 0, level_cost(target, 0, 0)
        for lv in (max(1, lr - 1), max(1, lr), lr + 1):
            cc = level_cost(target, 2 * lv - p, lv)
            if cc < best_c:
                best_l, best_c = lv, cc
        level = best_l * int(sgn[y, x])
        q[y, x] = level
        state = (32040 >> ((state << 2) + ((level & 1) << 1))) & 3
    return q


def dequant_dep(qcoeff: np.ndarray, qp: int,
                bit_depth: int = 10) -> np.ndarray:
    """Dependent-quant inverse (normative, DepQuant.cpp dequantBlock
    :705): QP+1, state-walked qIdx = 2*level -/+ (state>>1)."""
    from .quant import (IQUANT_SHIFT, _COEFF_MIN, _COEFF_MAX,
                        transform_shift, _needs_sqrt2)
    H, W = qcoeff.shape
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    sqrt_adj = _needs_sqrt2(log2w, log2h)
    qp_dq = qp + 1
    per, rem = qp_dq // 6, qp_dq % 6
    inv_scale = int(np.asarray(rom.inv_quant_scales())
                    [1 if sqrt_adj else 0][rem])
    tshift = transform_shift(bit_depth, log2w, log2h) - (1 if sqrt_adj else 0)
    shift = IQUANT_SHIFT + 1 - per - tshift
    if shift < 0:
        inv_scale <<= -shift
        shift = 0
    add = (1 << shift) >> 1

    scan = rom.scan_diag(W, H)
    vals = qcoeff[scan[:, 1], scan[:, 0]]
    nz = np.nonzero(vals)[0]
    out = np.zeros((H, W), np.int64)
    if not len(nz):
        return out.astype(np.int32)
    last = int(nz[-1])
    state = 0
    for pos in range(last, -1, -1):
        x, y = int(scan[pos, 0]), int(scan[pos, 1])
        level = int(qcoeff[y, x])
        if level:
            qidx = (level << 1) + (-(state >> 1) if level > 0
                                   else (state >> 1))
            out[y, x] = min(max((qidx * inv_scale + add) >> shift,
                                _COEFF_MIN), _COEFF_MAX)
        state = (32040 >> ((state << 2) + ((level & 1) << 1))) & 3
    return out.astype(np.int32)


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
