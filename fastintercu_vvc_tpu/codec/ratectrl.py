"""Rate control: R-lambda model with hierarchical GOP allocation.

Capability parity with EncoderLib/RateCtrl.cpp: per-picture bit
allocation from the target bitrate with hierarchical temporal-layer
weights and a smoothing window over the buffer surplus
(EncRCSeq::initBitsRatio / EncRCGOP), lambda from the R-lambda model
lambda = alpha * bpp^beta with SEPARATE (alpha, beta) state per
temporal level and for intra pictures (EncRCSeq::getPicPara),
QP from the standard 4.2005*ln(lambda)+13.7122 mapping
(estimatePicLambda, RateCtrl.cpp:848), model adaptation after each
picture with the 0.1/0.05 update rates (updateAfterPicture), and
CTU-level allocation from the remaining-bit budget
(getLCUTargetBpp :1002 / updateAfterCTU :1136).
"""

from __future__ import annotations

import math


class RateController:
    ALPHA0, BETA0 = 3.2003, -1.367
    ALPHA_UPDATE, BETA_UPDATE = 0.1, 0.05
    SMOOTH_WINDOW = 8
    INTRA_BOOST = 4.0          # intra pictures get a larger allocation
    # hierarchical-B bit-ratio weights per temporal layer (the CTC
    # GOP32 QP cascade implies roughly these bit ratios; VTM derives
    # them adaptively from lambda ratios - EncRCGOP::xCalEquaCoeff)
    LEVEL_W = (8.0, 5.0, 3.0, 2.0, 1.2, 1.0)

    def __init__(self, target_bps: float, fps: float, width: int,
                 height: int, min_qp: int = 10, max_qp: int = 49,
                 gop_tids=None):
        """gop_tids: temporal ids of the pictures of one GOP (e.g.
        [0, 3, 2, 3, 1, 3, 2, 3] for GOP8) - enables hierarchical
        allocation; None = flat (IPPP) allocation."""
        self.pixels = width * height
        self.avg_bits = target_bps / fps
        self.min_qp, self.max_qp = min_qp, max_qp
        # per-state R-lambda parameters: 'I' and one per temporal level
        self.models = {}
        self.surplus = 0.0        # allocated-but-unspent bits
        self.last_qp: int | None = None
        self.last_inter_qp: int | None = None
        self._last_lambda: float | None = None
        self._last_key = 0
        self._hier = bool(gop_tids)
        if gop_tids:
            ws = [self._w(t) for t in gop_tids]
            self._mean_w = sum(ws) / len(ws)
        else:
            self._mean_w = 1.0

    def _w(self, tid):
        if not getattr(self, "_hier", True):
            return 1.0          # flat (IPPP) allocation
        return self.LEVEL_W[min(tid, len(self.LEVEL_W) - 1)]

    def _model(self, key):
        if key not in self.models:
            self.models[key] = [self.ALPHA0, self.BETA0]
        return self.models[key]

    # back-compat introspection (trace hooks)
    @property
    def alpha(self):
        return self._model(self._last_key)[0]

    @property
    def beta(self):
        return self._model(self._last_key)[1]

    # ---- allocation + QP decision ----
    def qp_for_frame(self, is_intra: bool, tid: int = 0) -> int:
        key = "I" if is_intra else tid
        self._last_key = key
        if is_intra:
            target = self.avg_bits * self.INTRA_BOOST
        else:
            target = self.avg_bits * self._w(tid) / self._mean_w
        target += self.surplus / self.SMOOTH_WINDOW
        target = max(target, 32.0)
        bpp = target / self.pixels
        alpha, beta = self._model(key)
        lam = min(max(alpha * (bpp ** beta), 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        if self.last_inter_qp is not None and not is_intra:
            # clamp vs the previous INTER QP: intra pictures run much
            # lower and would otherwise drag the first post-intra
            # inter frame down, oscillating QP each intra period
            # (ADVICE r4 #5)
            qp = min(max(qp, self.last_inter_qp - 5),
                     self.last_inter_qp + 5)
        qp = min(max(qp, self.min_qp), self.max_qp)
        self._last_lambda = lam
        self._pending_target = target
        return qp

    # ---- model adaptation (updateAfterPicture) ----
    def update(self, qp_used: int, bits_used: int):
        self.last_qp = qp_used
        if self._last_key != "I":
            self.last_inter_qp = qp_used
        # buffer: every frame contributes the average allocation and
        # pays what it spent (intra overshoot borrows from the future)
        self.surplus += self.avg_bits - bits_used
        bpp_real = max(bits_used / self.pixels, 1e-7)
        m = self._model(self._last_key)
        alpha, beta = m
        lam_comp = alpha * (bpp_real ** beta)
        lam_real = self._last_lambda or lam_comp
        d = math.log(lam_real) - math.log(lam_comp)
        alpha += self.ALPHA_UPDATE * d * alpha
        beta += self.BETA_UPDATE * d * math.log(bpp_real)
        m[0] = min(max(alpha, 0.05), 500.0)
        m[1] = min(max(beta, -3.0), -0.1)

    # ---- CTU-level allocation (EncRCPic::getLCUTargetBpp /
    # updateAfterCTU analogue, RateCtrl.cpp:1002,1136) ----
    def start_frame(self, frame_qp: int, num_ctus: int,
                    ctu_pixels: int):
        """Begin CTU-level allocation for one picture; the frame
        target is the allocation chosen by qp_for_frame."""
        self._frame_qp = frame_qp
        self._num_ctus = num_ctus
        self._ctu_pixels = ctu_pixels
        self._frame_target = getattr(self, "_pending_target",
                                     self.avg_bits)
        self._ctu_idx = 0
        self._last_ctu_qp = frame_qp

    def qp_for_ctu(self, bits_spent: int) -> int:
        """QP for the next CTU from the remaining-bit budget: bpp ->
        R-lambda -> QP, clipped to +-1 of the previous CTU and +-2 of
        the picture QP (EncRCPic::getLCUEstLambdaAndQP clip rules)."""
        left = max(self._num_ctus - self._ctu_idx, 1)
        remaining = max(self._frame_target - bits_spent,
                        0.1 * self._frame_target * left / self._num_ctus)
        bpp = remaining / left / self._ctu_pixels
        alpha, beta = self._model(self._last_key)
        lam = min(max(alpha * (bpp ** beta), 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        qp = min(max(qp, self._last_ctu_qp - 1), self._last_ctu_qp + 1)
        qp = min(max(qp, self._frame_qp - 2), self._frame_qp + 2)
        qp = min(max(qp, self.min_qp), self.max_qp)
        self._last_ctu_qp = qp
        self._ctu_idx += 1
        return qp
