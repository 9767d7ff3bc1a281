"""Distortion kernels: batched SAD / SSE / SATD (Hadamard).

Behavioral parity: CommonLib/RdCost.cpp xGetSAD/xGetSSE/xGetHADs
(RdCost.h:334-381) — the ME/mode-decision hot loops, SIMD in the
reference (RdCostX86.h, 2337 LoC).

TPU-first: one jitted call evaluates ALL candidate blocks at once
([N, H, W] tensors); the 8x8 Hadamard is two batched matmuls against a
constant H8 matrix (MXU-friendly), matching VTM's xCalcHADs8x8 sum of
|transformed| with the same normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def sad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [...] sum of absolute differences."""
    return jnp.sum(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)),
                   axis=(-2, -1))


def sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.int64) - b.astype(jnp.int64)
    return jnp.sum(d * d, axis=(-2, -1))


@functools.lru_cache(maxsize=None)
def _hadamard(n: int) -> np.ndarray:
    if n == 1:
        return np.asarray([[1]], np.int32)
    h = _hadamard(n // 2)
    return np.block([[h, h], [h, -h]]).astype(np.int32)


def satd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """8x8-Hadamard SATD over [..., H, W] blocks (H, W multiples of 8).

    Parity: RdCost::xGetHADs / xCalcHADs8x8 — per 8x8 subblock:
    sum(|H8 * D * H8|) with the (sum+2)>>2 normalization, accumulated
    over the block.
    """
    d = (a.astype(jnp.int32) - b.astype(jnp.int32))
    H, W = d.shape[-2], d.shape[-1]
    assert H % 8 == 0 and W % 8 == 0, (H, W)
    lead = d.shape[:-2]
    # tile into 8x8 subblocks: [..., nbh, 8, nbw, 8] -> [..., nb, 8, 8]
    d = d.reshape(lead + (H // 8, 8, W // 8, 8))
    d = jnp.swapaxes(d, -3, -2).reshape(lead + (H // 8 * (W // 8), 8, 8))
    h8 = jnp.asarray(_hadamard(8))
    t = jnp.einsum("ij,...jk,kl->...il", h8, d, h8,
                   preferred_element_type=jnp.int32)
    per_sub = (jnp.sum(jnp.abs(t), axis=(-2, -1)) + 2) >> 2
    return jnp.sum(per_sub, axis=-1)


def satd4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """4x4-Hadamard SATD for small blocks (VTM xCalcHADs4x4 uses a
    different normalization: (sum+1)>>1 on the 4x4 transform)."""
    d = (a.astype(jnp.int32) - b.astype(jnp.int32))
    H, W = d.shape[-2], d.shape[-1]
    assert H % 4 == 0 and W % 4 == 0
    lead = d.shape[:-2]
    d = d.reshape(lead + (H // 4, 4, W // 4, 4))
    d = jnp.swapaxes(d, -3, -2).reshape(lead + (H // 4 * (W // 4), 4, 4))
    h4 = jnp.asarray(_hadamard(4))
    t = jnp.einsum("ij,...jk,kl->...il", h4, d, h4,
                   preferred_element_type=jnp.int32)
    per_sub = (jnp.sum(jnp.abs(t), axis=(-2, -1)) + 1) >> 1
    return jnp.sum(per_sub, axis=-1)


def satd_t(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lanes-last SATD: [H, W, *rest] blocks -> [*rest].

    Same math as satd() but with the batch dimensions MINOR so the TPU
    vector lanes (128-wide) run across blocks instead of across a
    w-sized row — the [N, h, w] layout wasted >80% of each lane tile
    for small coding blocks (w = 8..23), which made the whole-frame
    candidate screen the wall-time bottleneck of the fused search.
    Inputs broadcast against each other.
    """
    d = (a.astype(jnp.int32) - b.astype(jnp.int32))
    H, W = d.shape[0], d.shape[1]
    rest = d.shape[2:]
    assert H % 8 == 0 and W % 8 == 0, (H, W)
    d = d.reshape(H // 8, 8, W // 8, 8, -1)
    d = jnp.moveaxis(d, 2, 1).reshape(H // 8 * (W // 8), 8, 8, -1)
    h8 = jnp.asarray(_hadamard(8))
    t = jnp.einsum("ij,sjkm,kl->silm", h8, d, h8,
                   preferred_element_type=jnp.int32)
    per_sub = (jnp.sum(jnp.abs(t), axis=(1, 2)) + 2) >> 2
    return jnp.sum(per_sub, axis=0).reshape(rest)


def satd4_t(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lanes-last 4x4 SATD: [H, W, *rest] -> [*rest] (satd4 twin)."""
    d = (a.astype(jnp.int32) - b.astype(jnp.int32))
    H, W = d.shape[0], d.shape[1]
    rest = d.shape[2:]
    assert H % 4 == 0 and W % 4 == 0
    d = d.reshape(H // 4, 4, W // 4, 4, -1)
    d = jnp.moveaxis(d, 2, 1).reshape(H // 4 * (W // 4), 4, 4, -1)
    h4 = jnp.asarray(_hadamard(4))
    t = jnp.einsum("ij,sjkm,kl->silm", h4, d, h4,
                   preferred_element_type=jnp.int32)
    per_sub = (jnp.sum(jnp.abs(t), axis=(1, 2)) + 1) >> 1
    return jnp.sum(per_sub, axis=0).reshape(rest)
