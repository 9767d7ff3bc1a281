"""Rate control: per-picture R-lambda model.

Capability parity with EncoderLib/RateCtrl.cpp (EncRCSeq/EncRCPic,
estimatePicLambda :848, updateAfterPicture) in its CTC-default
per-picture form: bits are allocated from the target bitrate with a
smoothing window over the buffer surplus, lambda comes from the
R-lambda model lambda = alpha * bpp^beta, QP from the standard
4.2005*ln(lambda)+13.7122 mapping, and (alpha, beta) adapt after each
picture with the 0.1/0.05 update rates. CTU-level rate control and
the adaptive-ratio GOP allocation are future increments.
"""

from __future__ import annotations

import math


class RateController:
    ALPHA0, BETA0 = 3.2003, -1.367
    ALPHA_UPDATE, BETA_UPDATE = 0.1, 0.05
    SMOOTH_WINDOW = 8
    INTRA_BOOST = 4.0          # intra pictures get a larger allocation

    def __init__(self, target_bps: float, fps: float, width: int,
                 height: int, min_qp: int = 10, max_qp: int = 49):
        self.pixels = width * height
        self.avg_bits = target_bps / fps
        self.min_qp, self.max_qp = min_qp, max_qp
        self.alpha, self.beta = self.ALPHA0, self.BETA0
        self.surplus = 0.0        # allocated-but-unspent bits
        self.last_qp: int | None = None
        self._last_lambda: float | None = None
        self._last_target_bpp = 0.0

    # ---- allocation + QP decision ----
    def qp_for_frame(self, is_intra: bool) -> int:
        target = self.avg_bits + self.surplus / self.SMOOTH_WINDOW
        if is_intra:
            target *= self.INTRA_BOOST
        target = max(target, 32.0)
        bpp = target / self.pixels
        lam = self.alpha * (bpp ** self.beta)
        lam = min(max(lam, 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        if self.last_qp is not None:
            qp = min(max(qp, self.last_qp - 3), self.last_qp + 3)
        qp = min(max(qp, self.min_qp), self.max_qp)
        self._last_lambda = lam
        self._last_target_bpp = bpp
        self._pending_target = target
        return qp

    # ---- model adaptation ----
    def update(self, qp_used: int, bits_used: int):
        self.last_qp = qp_used
        # buffer: every frame contributes the average allocation and
        # pays what it spent (intra overshoot borrows from the future)
        self.surplus += self.avg_bits - bits_used
        bpp_real = max(bits_used / self.pixels, 1e-7)
        lam_comp = self.alpha * (bpp_real ** self.beta)
        lam_real = self._last_lambda or lam_comp
        d = math.log(lam_real) - math.log(lam_comp)
        self.alpha += self.ALPHA_UPDATE * d * self.alpha
        self.beta += self.BETA_UPDATE * d * math.log(bpp_real)
        self.alpha = min(max(self.alpha, 0.05), 500.0)
        self.beta = min(max(self.beta, -3.0), -0.1)

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
        lam = min(max(self.alpha * (bpp ** self.beta), 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        qp = min(max(qp, self._last_ctu_qp - 1), self._last_ctu_qp + 1)
        qp = min(max(qp, self._frame_qp - 2), self._frame_qp + 2)
        qp = min(max(qp, self.min_qp), self.max_qp)
        self._last_ctu_qp = qp
        self._ctu_idx += 1
        return qp
