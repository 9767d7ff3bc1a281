"""Adaptive QP from local activity (capability parity with
EncoderLib/AQp.cpp — variance-based adaptive quantization layers).

Per-CTU spatial activity (sub-block variance, AQp.cpp xPreanalyze
analogue) maps to a QP offset qp + round(strength * log2(act / avgAct))
clipped to +-qp_range; the offsets ride the cu_qp_delta machinery
(pps_cu_qp_delta_enabled), so busy areas get coarser quantization and
flat areas finer — the classic perceptual AQ trade.

Vectorized numpy (whole-frame block variance in one reshape); no
per-CTU Python loops.
"""

from __future__ import annotations

import numpy as np


def ctu_activity(luma: np.ndarray, ctu_size: int,
                 sub: int = 16) -> np.ndarray:
    """Per-CTU activity = 1 + min over sub-blocks of the variance
    (AQp uses the min of 2x2 half-CTU variances; we use min over
    sub x sub tiles, same intent: one flat quadrant keeps the CTU
    'flat')."""
    H, W = luma.shape
    x = luma.astype(np.float64)
    bh, bw = H // sub, W // sub
    t = x[:bh * sub, :bw * sub].reshape(bh, sub, bw, sub)
    var = t.var(axis=(1, 3))                       # [bh, bw]
    k = ctu_size // sub
    ch, cw = H // ctu_size, W // ctu_size
    v = var[:ch * k, :cw * k].reshape(ch, k, cw, k).min(axis=(1, 3))
    return 1.0 + v


def aq_offsets(luma: np.ndarray, ctu_size: int, strength: float = 1.0,
               qp_range: int = 5) -> np.ndarray:
    """Per-CTU QP offsets [ctus_y, ctus_x] (int)."""
    act = ctu_activity(luma, ctu_size)
    avg = float(np.exp(np.log(act).mean()))        # geometric mean
    off = np.round(strength * np.log2(act / avg))
    return np.clip(off, -qp_range, qp_range).astype(np.int32)


class AdaptiveQP:
    """ctu_qp_fn factory for FrameEncoder: per-frame offsets around
    the slice QP."""

    def __init__(self, strength: float = 1.0, qp_range: int = 5):
        self.strength = strength
        self.qp_range = qp_range

    def for_frame(self, luma: np.ndarray, base_qp: int, ctu_size: int,
                  min_qp: int = 0, max_qp: int = 63):
        off = aq_offsets(luma, ctu_size, self.strength, self.qp_range)

        def fn(x, y, bits_so_far=0):
            q = base_qp + int(off[y // ctu_size, x // ctu_size])
            return min(max(q, min_qp), max_qp)
        return fn
