"""LMCS — luma mapping with chroma scaling (the reshaper).

Parity map (reference: vtm-mlt-cpp/source/Lib):
  - LUT construction ......... CommonLib/Reshape.cpp:240
    (constructReshaper: pivots, fwd/inv scale coefficients,
    chromaAdjHelpLUT)
  - inverse PWL index ........ CommonLib/Reshape.cpp:203 (getPWLIdxInv)
  - chroma residual scaling .. CommonLib/Buffer.cpp:396 (scaleSignal)
  - VPDU neighbour average ... CommonLib/Reshape.cpp:106
    (calculateChromaAdjVpduNei)
  - curve derivation ......... EncoderLib/EncReshape.cpp (encoder-side
    model; ours is a simplified histogram/variance SDR allocation —
    any legal curve decodes identically)

All normative arithmetic is integer-exact. 16 PWL bins
(PIC_CODE_CW_BINS); OrgCW = (1 << bd) / 16; FP_PREC = CSCALE_FP_PREC =
11.
"""

from __future__ import annotations

import numpy as np

PIC_CODE_CW_BINS = 16
FP_PREC = 11
CSCALE_FP_PREC = 11


class LmcsModel:
    """Built LUTs + signalled parameters for one picture/sequence."""

    def __init__(self, bin_cw, crs_offset: int, bit_depth: int):
        self.bit_depth = bit_depth
        self.bin_cw = [int(v) for v in bin_cw]
        self.crs_offset = int(crs_offset)
        self.org_cw = (1 << bit_depth) // PIC_CODE_CW_BINS
        nz = [i for i, v in enumerate(self.bin_cw) if v]
        self.min_bin = nz[0] if nz else 0
        self.max_bin = nz[-1] if nz else PIC_CODE_CW_BINS - 1
        self._build()

    # -- constructReshaper (Reshape.cpp:240) --------------------------
    def _build(self):
        bd = self.bit_depth
        lut_size = 1 << bd
        init_cw = self.org_cw
        bin_len_log = (lut_size // PIC_CODE_CW_BINS).bit_length() - 1
        pivot = np.zeros(PIC_CODE_CW_BINS + 1, np.int64)
        inp = np.zeros(PIC_CODE_CW_BINS + 1, np.int64)
        fwd_sc = np.zeros(PIC_CODE_CW_BINS, np.int64)
        inv_sc = np.zeros(PIC_CODE_CW_BINS, np.int64)
        cadj = np.zeros(PIC_CODE_CW_BINS, np.int64)
        for i in range(PIC_CODE_CW_BINS):
            cw = self.bin_cw[i]
            pivot[i + 1] = pivot[i] + cw
            inp[i + 1] = inp[i] + init_cw
            fwd_sc[i] = (cw * (1 << FP_PREC)
                         + (1 << (bin_len_log - 1))) >> bin_len_log
            if cw == 0:
                inv_sc[i] = 0
                cadj[i] = 1 << CSCALE_FP_PREC
            else:
                inv_sc[i] = init_cw * (1 << FP_PREC) // cw
                cadj[i] = init_cw * (1 << FP_PREC) // \
                    (cw + self.crs_offset)
        self.pivot = pivot
        self.input_pivot = inp
        self.chroma_adj_lut = cadj

        xs = np.arange(lut_size, dtype=np.int64)
        idx = xs // init_cw
        tmp = pivot[idx] + ((fwd_sc[idx] * (xs - inp[idx])
                             + (1 << (FP_PREC - 1))) >> FP_PREC)
        self.fwd_lut = np.clip(tmp, 0, lut_size - 1).astype(np.int32)

        idx_inv = self._pwl_idx_inv_arr(xs)
        tmp = inp[idx_inv] + ((inv_sc[idx_inv] * (xs - pivot[idx_inv])
                               + (1 << (FP_PREC - 1))) >> FP_PREC)
        self.inv_lut = np.clip(tmp, 0, lut_size - 1).astype(np.int32)

    # -- getPWLIdxInv (Reshape.cpp:203) --------------------------------
    def _pwl_idx_inv_arr(self, vals):
        out = np.full(vals.shape, self.min_bin, np.int64)
        done = np.zeros(vals.shape, bool)
        for i in range(self.min_bin, self.max_bin + 1):
            hit = (~done) & (vals < self.pivot[i + 1])
            out[hit] = i
            done |= hit
        out[~done] = min(self.max_bin + 1, PIC_CODE_CW_BINS - 1)
        return out

    def pwl_idx_inv(self, v: int) -> int:
        for i in range(self.min_bin, self.max_bin + 1):
            if v < self.pivot[i + 1]:
                return i
        return min(self.max_bin + 1, PIC_CODE_CW_BINS - 1)

    def chroma_adj(self, avg_luma: int) -> int:
        """calculateChromaAdj: helper-LUT at the inverse PWL index of
        the (mapped-domain) average luma."""
        return int(self.chroma_adj_lut[self.pwl_idx_inv(avg_luma)])

    # -- signalled APS fields ------------------------------------------
    def aps_fields(self):
        """(min_bin_idx, delta_max_bin_idx, prec_minus1, deltas[],
        crs_offset) for codeLmcsAps (VLCWriter.cpp:613)."""
        deltas = [self.bin_cw[i] - self.org_cw
                  for i in range(self.min_bin, self.max_bin + 1)]
        max_abs = max((abs(d) for d in deltas), default=0)
        nbits = max(1, max_abs.bit_length())
        return (self.min_bin, PIC_CODE_CW_BINS - 1 - self.max_bin,
                nbits - 1, deltas, self.crs_offset)


def scale_fwd(resi: np.ndarray, scale: int, bit_depth: int) -> np.ndarray:
    """scaleSignal(dir=1): encoder-side forward chroma residual
    scaling (Buffer.cpp:396)."""
    max_abs = (1 << bit_depth) - 1
    sign = np.where(resi >= 0, 1, -1).astype(np.int64)
    absval = np.abs(resi.astype(np.int64))
    out = sign * (((absval << CSCALE_FP_PREC) + (scale >> 1)) // scale)
    return np.clip(out, -max_abs, max_abs).astype(np.int32)


def scale_inv(resi: np.ndarray, scale: int, bit_depth: int) -> np.ndarray:
    """scaleSignal(dir=0): decoder-side inverse chroma residual
    scaling."""
    max_abs = (1 << bit_depth) - 1
    r = np.clip(resi.astype(np.int64), -max_abs - 1, max_abs)
    sign = np.where(r >= 0, 1, -1).astype(np.int64)
    absval = np.abs(r)
    out = sign * ((absval * scale + (1 << (CSCALE_FP_PREC - 1)))
                  >> CSCALE_FP_PREC)
    return np.clip(out, -32768, 32767).astype(np.int32)


def derive_curve(org_y: np.ndarray, bit_depth: int = 10,
                 crs_offset: int = 0) -> LmcsModel:
    """Encoder-side SDR curve (EncReshape::deriveReshapeParametersSDR,
    simplified): allocate codewords by per-bin sample count and local
    activity — busy/populated bins get more codewords; the total stays
    at the full range. Any legal curve decodes identically; this one
    just has to be sensible."""
    org_cw = (1 << bit_depth) // PIC_CODE_CW_BINS
    bins = np.clip(org_y >> (bit_depth - 4), 0, 15)
    hist = np.bincount(bins.ravel(), minlength=16).astype(np.float64)
    # local activity per bin (mean abs horizontal gradient)
    grad = np.abs(np.diff(org_y.astype(np.int64), axis=1))
    gb = bins[:, 1:]
    act = np.zeros(16)
    for i in range(16):
        m = gb == i
        act[i] = float(grad[m].mean()) if m.any() else 0.0
    # importance: populated + low-activity bins benefit from expansion
    imp = hist / max(hist.sum(), 1.0)
    imp = imp * (1.0 + 1.0 / (1.0 + act / 8.0))
    imp = imp / max(imp.sum(), 1e-9)
    cw = np.round(imp * (1 << bit_depth)).astype(np.int64)
    cw = np.clip(cw, org_cw // 2, org_cw * 2 - 1)
    # renormalise to sum exactly (1 << bit_depth)
    total = 1 << bit_depth
    diff = total - int(cw.sum())
    i = 0
    order = np.argsort(-hist)
    while diff != 0:
        j = int(order[i % 16])
        step = 1 if diff > 0 else -1
        nv = int(cw[j]) + step
        if org_cw // 2 <= nv <= org_cw * 2 - 1:
            cw[j] = nv
            diff -= step
        i += 1
        if i > 1000:    # give up renormalising: fall back to identity
            cw[:] = org_cw
            break
    return LmcsModel(cw.tolist(), crs_offset, bit_depth)
