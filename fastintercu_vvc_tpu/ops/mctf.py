"""MCTF: motion-compensated temporal prefiltering of the encoder
input (capability parity with EncoderLib/EncTemporalFilter.cpp:133).

Non-normative (changes only the source pictures), so this is a clean
TPU-first redesign rather than a scalar port: the hierarchical block
motion search evaluates every block of the frame against every
candidate displacement as one batched reduction per pyramid level, and
the bilateral temporal blend is a single fused elementwise expression
over [numRefs, H, W] — both jitted once per frame geometry.

Math parity with the reference where it defines the behavior
(EncTemporalFilter.cpp:555-622): per-pixel weights
  w_i = overallStrength * compFactor * refStrength[row][idx]
        * exp(-(1024/(maxVal+1) * (ref_i - org))^2 / (2 sigma^2))
  out  = (org + sum w_i ref_i) / (1 + sum w_i)
with lumaSigma^2 = (QP-10)^2 * 9, chromaSigma^2 = 900, chroma factor
0.55 / luma 0.4, and the CTC strength schedule (8th frame: 0.95, 16th:
1.5; EncTemporalFilter.cpp:75, cfg:174-175). Motion is integer-pel
(the reference refines to sub-pel; filtering strength dominates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

RANGE = 2                      # +- frames (EncTemporalFilter.cpp:46)
CHROMA_FACTOR = 0.55
LUMA_FACTOR = 0.4
SIGMA_MULT = 9.0
SIGMA_ZERO = 10.0
# rows: numRefs == 4 / == 2 / other; cols: |offset|-1 clamped to 1
REF_STRENGTHS = ((0.85, 0.60), (1.20, 1.00), (0.30, 0.30))


def _avg_pool2(x):
    h, w = x.shape
    return x.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _block_sads(org, ref, block, mvs, cands):
    """SAD of every block against every candidate displacement added
    to the block's current MV estimate. org/ref: [H, W]; mvs:
    [bh, bw, 2]; cands: [n, 2] -> [n, bh, bw]."""
    h, w = org.shape
    bh, bw = h // block, w // block
    ys = jnp.arange(h)
    xs = jnp.arange(w)

    def one(c):
        mv = mvs + c[None, None, :]               # [bh, bw, 2]
        mvy = jnp.repeat(jnp.repeat(mv[..., 0], block, 0), block, 1)
        mvx = jnp.repeat(jnp.repeat(mv[..., 1], block, 0), block, 1)
        gy = jnp.clip(ys[:, None] + mvy, 0, h - 1)
        gx = jnp.clip(xs[None, :] + mvx, 0, w - 1)
        diff = jnp.abs(ref[gy, gx] - org)
        return diff.reshape(bh, block, bw, block).sum(axis=(1, 3))

    return jax.vmap(one)(cands)


def _me_level(org, ref, block, mvs, search):
    """Refine per-block MVs by exhaustive +-search at this level."""
    rng = jnp.arange(-search, search + 1)
    cands = jnp.stack(jnp.meshgrid(rng, rng, indexing="ij"),
                      -1).reshape(-1, 2)
    sads = _block_sads(org, ref, block, mvs, cands)
    best = jnp.argmin(sads, axis=0)
    return mvs + cands[best]


def _upscale_mvs(mvs, bh, bw):
    up = jnp.repeat(jnp.repeat(mvs * 2, 2, 0), 2, 1)
    return up[:bh, :bw]


@functools.partial(jax.jit, static_argnums=(2,))
def motion_search(org, ref, block: int = 16):
    """3-level hierarchical integer block ME (parity in spirit with
    EncTemporalFilter::motionEstimationLuma pyramid). -> [bh, bw, 2]
    (y, x) per block."""
    o2, r2 = _avg_pool2(org.astype(jnp.float32)), _avg_pool2(
        ref.astype(jnp.float32))
    o4, r4 = _avg_pool2(o2), _avg_pool2(r2)
    h, w = org.shape
    bh, bw = h // block, w // block
    mvs4 = jnp.zeros((h // 4 // (block // 4), w // 4 // (block // 4), 2),
                     jnp.int32)
    mvs4 = _me_level(o4, r4, block // 4, mvs4, 6)
    mvs2 = _upscale_mvs(mvs4, h // 2 // (block // 2),
                        w // 2 // (block // 2))
    mvs2 = _me_level(o2, r2, block // 2, mvs2, 2)
    mvs = _upscale_mvs(mvs2, bh, bw)
    return _me_level(org.astype(jnp.float32), ref.astype(jnp.float32),
                     block, mvs, 2)


def _apply_motion(ref, mvs, block):
    h, w = ref.shape
    mvy = jnp.repeat(jnp.repeat(mvs[..., 0], block, 0), block, 1)
    mvx = jnp.repeat(jnp.repeat(mvs[..., 1], block, 0), block, 1)
    gy = jnp.clip(jnp.arange(h)[:, None] + mvy, 0, h - 1)
    gx = jnp.clip(jnp.arange(w)[None, :] + mvx, 0, w - 1)
    return ref[gy, gx]


@functools.partial(jax.jit, static_argnums=(4, 5))
def bilateral_blend(org, refs, ref_strengths, sigma_sq,
                    weight_scaling: float, bit_depth: int):
    """The EncTemporalFilter::bilateralFilter pixel math, batched over
    refs. org [H,W]; refs [n,H,W] (already motion-corrected);
    ref_strengths [n]."""
    max_val = (1 << bit_depth) - 1
    bd_w = 1024.0 / (max_val + 1)
    o = org.astype(jnp.float32)
    r = refs.astype(jnp.float32)
    diff = (r - o) * bd_w
    w = weight_scaling * ref_strengths[:, None, None] * jnp.exp(
        -diff * diff / (2.0 * sigma_sq))
    new = (o + (w * r).sum(0)) / (1.0 + w.sum(0))
    return jnp.clip(jnp.round(new), 0, max_val).astype(jnp.int32)


def filter_strength(poc: int, gop8: float = 0.95,
                    gop16: float = 1.5) -> float | None:
    """CTC strength schedule: longer interval wins (cfg:174-175)."""
    if poc % 16 == 0:
        return gop16
    if poc % 8 == 0:
        return gop8
    return None


def mctf_frame(frames: list, idx: int, qp: int, strength: float,
               bit_depth: int = 10, block: int = 16):
    """Filter frame `idx` of a (y, u, v)-tuple (or luma-only) list
    using up to +-RANGE neighbors. Returns the filtered frame in the
    same format; inputs are numpy, compute is jitted JAX."""
    item = frames[idx]
    has_chroma = isinstance(item, tuple)
    offsets = [o for o in range(-RANGE, RANGE + 1)
               if o != 0 and 0 <= idx + o < len(frames)]
    if not offsets:
        return item

    def _luma(f):
        return np.asarray(f[0] if has_chroma else f)

    H, W = _luma(item).shape
    # the pyramid ME needs dims divisible by the block size at the
    # quarter level (16): edge-pad and crop the filtered output
    ph, pw = -H % block, -W % block
    phc, pwc = ph // 2, pw // 2

    def padl(a):
        return jnp.asarray(np.pad(a, ((0, ph), (0, pw)), mode="edge"),
                           jnp.int32)

    def padc(a):
        return jnp.asarray(np.pad(a, ((0, phc), (0, pwc)),
                                  mode="edge"), jnp.int32)

    org_y = padl(_luma(item))
    refs_y = [padl(_luma(frames[idx + o])) for o in offsets]
    mvs = [motion_search(org_y, r, block) for r in refs_y]
    corrected_y = jnp.stack([_apply_motion(r, m, block)
                             for r, m in zip(refs_y, mvs)])
    n = len(offsets)
    row = 0 if n == 2 * RANGE else (1 if n == RANGE else 2)
    rs = jnp.asarray([REF_STRENGTHS[row][min(1, abs(o) - 1)]
                      for o in offsets], jnp.float32)
    luma_sigma_sq = (qp - SIGMA_ZERO) ** 2 * SIGMA_MULT
    out_y = np.asarray(bilateral_blend(
        org_y, corrected_y, rs, luma_sigma_sq,
        float(strength * LUMA_FACTOR), bit_depth))[:H, :W]
    if not has_chroma:
        return out_y
    outs_c = []
    for pi in (1, 2):
        hc, wc = item[pi].shape
        org_c = padc(item[pi])
        corr = jnp.stack([
            _apply_motion(padc(frames[idx + o][pi]),
                          m // 2, block // 2)
            for o, m in zip(offsets, mvs)])
        outs_c.append(np.asarray(bilateral_blend(
            org_c, corr, rs, 30.0 * 30.0,
            float(strength * CHROMA_FACTOR),
            bit_depth))[:hc, :wc])
    return (out_y, outs_c[0], outs_c[1])


def mctf_sequence(frames: list, qp: int, bit_depth: int = 10,
                  gop8: float = 0.95, gop16: float = 1.5) -> list:
    """Filter a whole input sequence per the CTC schedule
    (EncTemporalFilter::filter parity at the pipeline level)."""
    out = list(frames)
    for i in range(len(frames)):
        s = filter_strength(i, gop8, gop16)
        if s is not None:
            out[i] = mctf_frame(frames, i, qp, s, bit_depth)
    return out
