"""Scalar quantization / dequantization — batched, integer-exact.

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/Quant.cpp:
  - Quant::quant (:~880): iQBits = 14 + qp/6 + transformShift (−1 when the
    sqrt(2) block-size adjustment applies); deadzone iAdd =
    (IRAP ? 171 : 85) << (iQBits − 9); magnitude = (|c|·scale + iAdd) >>
    iQBits; clip to ±2^15.
  - Quant::dequant (:356): scale = invQuantScales[sqrtAdj][qp%6];
    rightShift = 6 − (transformShift + qp/6); input clip to 16 bit;
    (c·scale + add) >> rightShift (or << −rightShift); clip to ±2^15.
  - transformShift = 15 − bitDepth − (log2W + log2H)/2
    (ChromaFormat.h:111-114), QUANT_SHIFT=14 / IQUANT_SHIFT=6
    (CommonDef.h:326-327), scale tables Rom.cpp:478-488.

TPU-first: whole batches of equal-geometry TUs quantized in one
elementwise pass (VPU); no per-TU host loops. Scaling lists (off in CTC),
RDOQ and dependent quant live in separate modules.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import rom

QUANT_SHIFT = 14
IQUANT_SHIFT = 6
MAX_LOG2_TR_DYNAMIC_RANGE = 15
_COEFF_MIN = -(1 << MAX_LOG2_TR_DYNAMIC_RANGE)
_COEFF_MAX = (1 << MAX_LOG2_TR_DYNAMIC_RANGE) - 1


def transform_shift(bit_depth: int, log2w: int, log2h: int) -> int:
    return MAX_LOG2_TR_DYNAMIC_RANGE - bit_depth - ((log2w + log2h) >> 1)


def _needs_sqrt2(log2w: int, log2h: int) -> bool:
    return ((log2w + log2h) & 1) == 1


def quant(coeff: jnp.ndarray, qp: int, bit_depth: int = 10,
          is_irap: bool = False, transform_skip: bool = False) -> jnp.ndarray:
    """Forward scalar quant of [..., H, W] int32 transform coefficients.

    qp is the effective component QP (incl. bit-depth offset handling by
    the caller). Static per-geometry; jit specializes on shapes.
    """
    H, W = coeff.shape[-2], coeff.shape[-1]
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    sqrt_adj = _needs_sqrt2(log2w, log2h) and not transform_skip
    per, rem = qp // 6, qp % 6
    scale = int(np.asarray(rom.quant_scales())[1 if sqrt_adj else 0][rem])
    tshift = transform_shift(bit_depth, log2w, log2h) - (1 if sqrt_adj else 0)
    iqbits = QUANT_SHIFT + per + (0 if transform_skip else tshift)
    iadd = (171 if is_irap else 85) << (iqbits - 9)

    # int32 suffices: |c| <= 2^15, scale < 2^15 -> product < 2^30; iadd
    # keeps the sum under 2^31 for all valid QPs.
    c = coeff.astype(jnp.int32)
    mag = (jnp.abs(c) * scale + iadd) >> iqbits
    q = jnp.sign(c) * mag
    return jnp.clip(q, _COEFF_MIN, _COEFF_MAX).astype(jnp.int32)


def dequant(qcoeff: jnp.ndarray, qp: int, bit_depth: int = 10,
            transform_skip: bool = False) -> jnp.ndarray:
    """Inverse scalar quant (normative §8.7.3) of [..., H, W] int32 levels."""
    H, W = qcoeff.shape[-2], qcoeff.shape[-1]
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    sqrt_adj = _needs_sqrt2(log2w, log2h) and not transform_skip
    per, rem = qp // 6, qp % 6
    scale = int(np.asarray(rom.inv_quant_scales())[1 if sqrt_adj else 0][rem])
    tshift = transform_shift(bit_depth, log2w, log2h) - (1 if sqrt_adj else 0)
    right_shift = IQUANT_SHIFT - ((0 if transform_skip else tshift) + per)

    c = jnp.clip(qcoeff.astype(jnp.int32), -32768, 32767)
    if right_shift > 0:
        dq = (c * scale + (1 << (right_shift - 1))) >> right_shift
    else:
        dq = (c * scale) << (-right_shift)
    return jnp.clip(dq, _COEFF_MIN, _COEFF_MAX).astype(jnp.int32)
