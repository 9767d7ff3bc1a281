"""CABAC bit estimation — the RDO rate model.

Parity: VTM's estimation-only CABAC subclasses (BinEncoder.h:229-271
BitEstimator / CABACEstimator): during RD search the reference never
runs the arithmetic engine; it accumulates *fractional bits* per bin
from a 256-entry table indexed by the context's 8-bit probability
state, while the context states adapt exactly as in real coding.

Two layers here:

1. `BitCounter` — a duck-typed stand-in for cabac.CabacEncoder: every
   syntax writer in this package (write_split_mode, write_mvd, the
   residual coder, ...) takes an `enc` and only calls encode_bin /
   encode_bin_ep / encode_bins_ep / encode_bin_trm, so any of them can
   be costed without touching the arithmetic engine.

2. Vectorized table helpers for the batched (whole-frame) search:
   per-context fractional-bit lookups as numpy arrays, plus closed-form
   bin counts for the EP syntax (mvd remainders), evaluated for whole
   grids of blocks at once (SURVEY.md §7.1 "two-phase entropy coding").

Units: 2^-15 bit ("frac bits"), matching VTM's SCALE_BITS.
"""

from __future__ import annotations

import functools

import numpy as np

from . import cabac, ctx_ids

SCALE_BITS = 15
EP_BIT = 1 << SCALE_BITS             # one equiprobable bin


@functools.lru_cache(maxsize=1)
def frac_bits_table() -> np.ndarray:
    """[256, 2] int32: fracBits[state8][bin] = -log2(P(bin)) * 2^15.

    state8 = (state0 + state1) >> 8 is the engine's 8-bit probability
    summary (cabac.ContextBank.state8); P(bin=1) ~= state8/256. VTM
    bakes the same quantity as BinProbModel_Std::m_binFracBits.
    """
    q = (np.arange(256, dtype=np.float64) + 0.5) / 256.0
    b1 = np.round(-np.log2(q) * (1 << SCALE_BITS))
    b0 = np.round(-np.log2(1.0 - q) * (1 << SCALE_BITS))
    out = np.stack([b0, b1], axis=1)
    return np.clip(out, 1, 1 << 24).astype(np.int32)


def bank_frac(bank: cabac.ContextBank) -> np.ndarray:
    """[numCtx, 2] int32 fractional-bit cost of coding bin 0/1 in each
    context at its CURRENT state (vectorized; no adaptation)."""
    state8 = ((bank.state0.astype(np.int32)
               + bank.state1.astype(np.int32)) >> 8)
    return frac_bits_table()[state8]


class BitCounter:
    """Estimation-only CABAC 'encoder' (VTM BitEstimator parity).

    Presents the same bin-level interface as cabac.CabacEncoder; the
    syntax writers are agnostic. Context states adapt (update=True,
    the CABACEstimator behavior) so multi-symbol estimates track the
    real engine; set update=False for stateless one-shot costs.
    """

    def __init__(self, ctx: cabac.ContextBank, update: bool = True):
        self.ctx = ctx
        self.update = update
        self.frac = 0
        self.out = b""           # len(enc.out) compat (always empty)
        self._tab = frac_bits_table()

    def encode_bin(self, bin_: int, ctx_id: int):
        q = self.ctx.state8(ctx_id)
        self.frac += int(self._tab[q, 1 if bin_ else 0])
        if self.update:
            self.ctx.update(ctx_id, bin_)

    def encode_bin_ep(self, bin_: int):
        self.frac += EP_BIT

    def encode_bins_ep(self, bins: int, num_bins: int):
        self.frac += EP_BIT * num_bins

    def encode_bin_trm(self, bin_: int):
        self.frac += EP_BIT       # terminating bin ~ 1 bit upper bound

    def bits(self) -> float:
        return self.frac / float(1 << SCALE_BITS)

    def snapshot(self):
        return (self.frac, self.ctx.state0.copy(), self.ctx.state1.copy())

    def restore(self, snap):
        self.frac = snap[0]
        self.ctx.state0[:] = snap[1]
        self.ctx.state1[:] = snap[2]


# ---------------------------------------------------------------------------
# Vectorized syntax costs for the batched whole-frame search.
# All return float64 numpy arrays in BITS (not frac units) so they drop
# straight into lambda*rate SATD costs.


def mvd_bits(mvd_x: np.ndarray, mvd_y: np.ndarray,
             fb: np.ndarray) -> np.ndarray:
    """Bits of mvd_coding(mvd) for arrays of quarter-pel mvd components
    (encoder.write_mvd syntax, vectorized).

    fb: [numCtx, 2] from bank_frac (init-state approximation — the
    batched search has no per-block context history).
    """
    gt0 = fb[ctx_ids.Mvd[0]]
    gt1 = fb[ctx_ids.Mvd[0] + 1]
    scale = float(1 << SCALE_BITS)

    def comp(v):
        a = np.abs(v.astype(np.int64))
        bits = np.where(a > 0, gt0[1], gt0[0]) / scale
        bits = bits + np.where(a > 0,
                               np.where(a > 1, gt1[1], gt1[0]) / scale,
                               0.0)
        # remainder: encodeRemAbsEP(a-2, rice=1, cutoff=0) — pure EG:
        # prefix_len = floor(log2((v>>1)+1)), bins = 2*prefix_len + 2
        r = np.maximum(a - 2, 0)
        pref = np.floor(np.log2((r >> 1) + 1)).astype(np.int64)
        rem_bits = (2 * pref + 2).astype(np.float64)
        bits = bits + np.where(a > 1, rem_bits, 0.0)
        bits = bits + np.where(a > 0, 1.0, 0.0)    # sign
        return bits

    return comp(mvd_x) + comp(mvd_y)


class SplitRate:
    """Per-geometry split_cu_mode bit estimates for the batched search.

    Contexts are approximated with neutral neighbors (same-size left
    and above CU: the ctx increments from smaller-neighbor comparisons
    are 0) at the slice-init context states. For each (w, h, qt_depth,
    mtt_depth, last_split) the cost of each legal split choice is
    computed once with a BitCounter and cached.
    """

    def __init__(self, bank: cabac.ContextBank, pc):
        self.bank = bank
        self.pc = pc
        self._cache: dict = {}

    class _Neutral:
        """Neighbor stub: same-size CUs at the same qt depth."""

        def __init__(self, w, h, qt_depth):
            self.w, self.h, self.d = w, h, qt_depth

        def cu_size(self, x, y):
            return (self.w, self.h)

        def qt_depth(self, x, y):
            return self.d

    def costs(self, w: int, h: int, qt_depth: int, mtt_depth: int,
              last_split: int = 1, tt_mid: int | None = None) -> dict:
        """-> {split_mode: bits} for every legal split of this
        geometry (partition.can_split legality, interior block).
        tt_mid: BT_H/BT_V when the node is the middle child of a TT in
        that direction (parallel-TT restriction)."""
        from . import partition
        key = (w, h, qt_depth, mtt_depth, last_split, tt_mid)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        cans = partition.can_split(w, h, qt_depth, mtt_depth, self.pc,
                                   last_split, tt_mid)
        ctxs = partition.split_ctx(self._Neutral(w, h, qt_depth),
                                   w, h, w, h, qt_depth, mtt_depth, cans)
        names = [partition.NO_SPLIT, partition.QT_SPLIT, partition.BT_H,
                 partition.BT_V, partition.TT_H, partition.TT_V]
        out = {}
        for sp, ok in zip(names, cans):
            if not ok:
                continue
            bc = BitCounter(self.bank.copy(), update=False)
            partition.write_split_mode(bc, sp, cans, ctxs)
            out[sp] = bc.bits()
        self._cache[key] = out
        return out


def intra_mode_bits(fb: np.ndarray, n_mpm_hit: float = 0.5) -> float:
    """Expected intra_luma_pred_mode bits under a blended MPM-hit
    model: n_mpm_hit of the time an MPM (avg ~2.5 index bins), else
    the 5/6-bit truncated-binary non-MPM code. The batched search has
    no MPM context, so a single expected value is used per leaf."""
    scale = float(1 << SCALE_BITS)
    mpm_flag = fb[ctx_ids.IntraLumaMpmFlag[0]]
    planar = fb[ctx_ids.IntraLumaPlanarFlag[0] + 1]
    hit = mpm_flag[1] / scale + planar.mean() / scale + 2.0
    miss = mpm_flag[0] / scale + 5.95
    return n_mpm_hit * hit + (1 - n_mpm_hit) * miss


def merge_bits(fb: np.ndarray, m_idx: np.ndarray) -> np.ndarray:
    """merge flag + merge_idx (TR, ctx bin then EP) bits for an array
    of candidate indices."""
    scale = float(1 << SCALE_BITS)
    mf = fb[ctx_ids.MergeFlag[0], 1] / scale
    mi0 = fb[ctx_ids.MergeIdx[0]] / scale
    idx = np.asarray(m_idx, np.int64)
    bits = np.where(idx > 0, mi0[1], mi0[0])
    bits = bits + np.maximum(idx - 1, 0) + (idx > 0) * 0.0
    return mf + bits
