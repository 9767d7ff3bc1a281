"""Primary transforms (DCT-II / DST-VII / DCT-VIII) — batched, integer-exact.

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/TrQuant.cpp:730 (xT),
:806 (xIT) and TrQuant_EMT.cpp fastForward/Inverse kernels; constants:
  - 6-bit transform cores (Rom.h:83 g_transformMatrixShift = {6, 6}),
  - COM16_C806_TRANS_PREC = 0 (CommonDef.h:414),
  - maxLog2TrDynamicRange = 15 (SPS default, extended precision off),
  - forward shifts: s1 = log2W + bitDepth + 6 - 15, s2 = log2H + 6
    (TrQuant.cpp:781-782),
  - inverse shifts: s1 = 7 (clip to ±2^15), s2 = 20 - bitDepth
    (TrQuant.cpp:844-845), output clipped to int16 Pel range,
  - zero-out: DCT2 keeps first 32 coeffs of a 64-length dim; DST7/DCT8
    keep 16 of 32 (JVET_C0024_ZERO_OUT_TH, TrQuant.cpp:744-745).

TPU-first design: the per-TU recursive butterflies become *batched integer
matmuls* against the ROM cores — [B, H, W] blocks of one geometry are
transformed in a single dot_general pair (MXU-friendly; the butterfly
factorization is an exact linear map, so plain matmul is bit-identical).
Integer exactness: int32 dot_general (XLA integer dot); all rounding is
(x + (1 << (s-1))) >> s with arithmetic shift, matching C.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import rom

# Transform type ids (match spec tu_mts_idx semantics, not VTM enum order)
DCT2, DCT8, DST7 = 0, 1, 2
_KIND_NAME = {DCT2: "DCT2", DCT8: "DCT8", DST7: "DST7"}

MAX_LOG2_TR_DYNAMIC_RANGE = 15
TR_MAT_SHIFT = 6
ZERO_OUT_TH = 32


@functools.lru_cache(maxsize=None)
def _core(kind: int, size: int) -> np.ndarray:
    return rom.trans_matrix(_KIND_NAME[kind], size).astype(np.int32)


def _rshift_round(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """(x + (1 << (shift-1))) >> shift, arithmetic; shift==0 passes through
    (parity: TrQuant_EMT.cpp 'add = shift > 0 ? 1 << (shift-1) : 0')."""
    if shift <= 0:
        return x
    return (x + (1 << (shift - 1))) >> shift


def _keep(kind: int, n: int) -> int:
    """Number of low-frequency outputs retained in a length-n dimension."""
    if kind != DCT2 and n == 32:
        return 16
    return min(n, ZERO_OUT_TH)


def fwd_transform_2d(resi: jnp.ndarray, kind_h: int = DCT2,
                     kind_v: int = DCT2, bit_depth: int = 10) -> jnp.ndarray:
    """Forward 2-D transform of a batch of residual blocks.

    resi: [..., H, W] int32. Returns [..., H, W] int32 coefficients
    (coeff[..., v, u]) with zeroed-out high frequencies, bit-exact with
    VTM's fastForward path for the same MTS kinds.
    """
    H, W = resi.shape[-2], resi.shape[-1]
    log2w, log2h = W.bit_length() - 1, H.bit_length() - 1
    s1 = log2w + bit_depth + TR_MAT_SHIFT - MAX_LOG2_TR_DYNAMIC_RANGE
    s2 = log2h + TR_MAT_SHIFT

    kw, kh = _keep(kind_h, W), _keep(kind_v, H)
    Tw = jnp.asarray(_core(kind_h, W)[:kw])          # [kw, W]
    Tv = jnp.asarray(_core(kind_v, H)[:kh])          # [kh, H]

    x = resi.astype(jnp.int32)
    # stage 1 (horizontal): A[..., j, k] = rnd(sum_n x[..., j, n] Tw[k, n])
    a = jnp.einsum("...jn,kn->...jk", x, Tw,
                   preferred_element_type=jnp.int32)
    a = _rshift_round(a, s1)
    # stage 2 (vertical): C[..., v, k] = rnd(sum_j Tv[v, j] A[..., j, k])
    c = jnp.einsum("vj,...jk->...vk", Tv, a,
                   preferred_element_type=jnp.int32)
    c = _rshift_round(c, s2)
    # pad zeroed-out high-frequency region back to [H, W]
    pad = [(0, 0)] * (c.ndim - 2) + [(0, H - kh), (0, W - kw)]
    return jnp.pad(c, pad)


def inv_transform_2d(coeff: jnp.ndarray, kind_h: int = DCT2,
                     kind_v: int = DCT2, bit_depth: int = 10) -> jnp.ndarray:
    """Inverse 2-D transform (normative, spec §8.7.4.{2,3}).

    coeff: [..., H, W] int32. Returns int32 residual, clipped to the Pel
    int16 range as VTM does (TrQuant.cpp:815-816).
    """
    H, W = coeff.shape[-2], coeff.shape[-1]
    s1 = TR_MAT_SHIFT + 1                       # 7
    s2 = TR_MAT_SHIFT + MAX_LOG2_TR_DYNAMIC_RANGE - 1 - bit_depth
    clip_lo, clip_hi = -(1 << MAX_LOG2_TR_DYNAMIC_RANGE), (1 << MAX_LOG2_TR_DYNAMIC_RANGE) - 1

    kw, kh = _keep(kind_h, W), _keep(kind_v, H)
    Tw = jnp.asarray(_core(kind_h, W)[:kw])          # [kw, W]
    Tv = jnp.asarray(_core(kind_v, H)[:kh])          # [kh, H]

    c = coeff.astype(jnp.int32)[..., :kh, :kw]
    # stage 1 (vertical): B[..., j, u] = rnd(sum_v Tv[v, j] c[..., v, u])
    b = jnp.einsum("vj,...vu->...ju", Tv, c,
                   preferred_element_type=jnp.int32)
    b = jnp.clip(_rshift_round(b, s1), clip_lo, clip_hi)
    # stage 2 (horizontal): r[..., j, n] = rnd(sum_u b[..., j, u] Tw[u, n])
    r = jnp.einsum("...ju,un->...jn", b, Tw,
                   preferred_element_type=jnp.int32)
    r = _rshift_round(r, s2)
    return jnp.clip(r, -32768, 32767)


def fwd_transform_1xN(resi: jnp.ndarray, kind: int = DCT2,
                      bit_depth: int = 10, axis: int = -1) -> jnp.ndarray:
    """1-D forward transform (W==1 or H==1 TUs, TrQuant.cpp:790-803)."""
    n = resi.shape[axis]
    log2n = n.bit_length() - 1
    s = log2n + bit_depth + TR_MAT_SHIFT - MAX_LOG2_TR_DYNAMIC_RANGE
    k = _keep(kind, n)
    T = jnp.asarray(_core(kind, n)[:k])
    x = jnp.moveaxis(resi.astype(jnp.int32), axis, -1)
    c = jnp.einsum("...n,kn->...k", x, T, preferred_element_type=jnp.int32)
    c = _rshift_round(c, s)
    c = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, n - k)])
    return jnp.moveaxis(c, -1, axis)


def inv_transform_1xN(coeff: jnp.ndarray, kind: int = DCT2,
                      bit_depth: int = 10, axis: int = -1) -> jnp.ndarray:
    """1-D inverse transform (TrQuant.cpp:852-866)."""
    n = coeff.shape[axis]
    s = TR_MAT_SHIFT + MAX_LOG2_TR_DYNAMIC_RANGE - 1 - bit_depth
    k = _keep(kind, n)
    T = jnp.asarray(_core(kind, n)[:k])
    c = jnp.moveaxis(coeff.astype(jnp.int32), axis, -1)[..., :k]
    r = jnp.einsum("...u,un->...n", c, T, preferred_element_type=jnp.int32)
    r = _rshift_round(r, s)
    r = jnp.clip(r, -32768, 32767)
    return jnp.moveaxis(r, -1, axis)
