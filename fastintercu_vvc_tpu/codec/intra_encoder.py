"""Minimum-viable intra frame encoder ("one model end-to-end" slice of
SURVEY.md §7.2 step 2): monochrome (4:0:0), fixed CU = CTU, planar mode,
DCT2 + scalar quant, no in-loop filters. Produces a VVC bitstream that
the reference VTM-11 DecoderApp must decode bit-exactly to our own
reconstruction.

Syntax parity chain: EncSlice::encodeCtus -> CABACWriter::
coding_tree_unit / coding_tree / coding_unit / intra_luma_pred_modes /
transform_unit / residual_coding (+ end_of_slice) — see codec/hls.py,
codec/residual.py for the per-function citations.

This module is deliberately sequential/host-side: it is the correctness
bootstrap. The batched TPU partition-search encoder replaces the
per-CTU Python loop; both share the same ops/ kernels and codec/ syntax
writers.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import intra, transforms, quant
from . import cabac, contexts, ctx_ids, hls, residual


@dataclasses.dataclass
class FrameResult:
    bitstream: bytes          # complete annex-B stream (SPS+PPS+slice)
    recon: np.ndarray         # our reconstruction [H, W] int
    num_bits: int


def _clip_pel(x, bit_depth):
    return np.clip(x, 0, (1 << bit_depth) - 1)


class IntraFrameEncoder:
    """Encodes I-frames with fixed CTU-sized planar CUs."""

    def __init__(self, cfg: hls.SeqConfig):
        assert cfg.chroma_format == hls.CHROMA_400, "MVP is 4:0:0"
        assert cfg.width % cfg.ctu_size == 0
        assert cfg.height % cfg.ctu_size == 0
        assert cfg.min_qt_intra == cfg.ctu_size, "MVP: CU == CTU (no splits)"
        assert cfg.max_mtt_depth_intra == 0
        self.cfg = cfg

    def encode_frame(self, org: np.ndarray, poc: int = 0,
                     qp: int | None = None) -> FrameResult:
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        bd = cfg.bit_depth
        H, W = org.shape
        assert (H, W) == (cfg.height, cfg.width)
        cs = cfg.ctu_size

        recon = np.zeros((H, W), np.int32)
        bank = contexts.init_bank(contexts.I_SLICE, qp)
        enc = cabac.CabacEncoder(bank)

        for cty in range(0, H, cs):
            for ctx_x in range(0, W, cs):
                self._encode_ctu(enc, org, recon, ctx_x, cty, qp)

        enc.encode_bin_trm(1)            # end_of_slice_one_bit
        payload = enc.finish()
        pic = hls.PicConfig(poc=poc, slice_type=hls.I_SLICE,
                            nal_type=hls.NAL_IDR_N_LP, qp=qp)
        bs = hls.bitstream_for_frames(cfg, [(pic, payload, enc.tail_bits())])
        return FrameResult(bs, recon, len(bs) * 8)

    # ------------------------------------------------------------------
    def _encode_ctu(self, enc, org, recon, x, y, qp):
        cfg = self.cfg
        cs = cfg.ctu_size
        bd = cfg.bit_depth

        # ----- reconstruction path (normative ops) -----
        top, left = intra.build_refs(recon, x, y, cs, cs, bd)
        if intra.needs_ref_filter(intra.PLANAR_IDX, cs, cs):
            ftop, fleft = intra.filter_refs(top, left)
        else:
            ftop, fleft = top, left
        pred = intra.predict(intra.PLANAR_IDX, ftop, fleft, cs, cs,
                             apply_pdpc=True)
        # PDPC uses the *filtered* refs in VTM? No: PDPC reads srcBuf which
        # is the same buffer used for prediction (filtered when refFilter).
        resi = org[y:y + cs, x:x + cs].astype(np.int32) - pred

        # effective luma QP includes the bit-depth offset
        # (spec Qp'Y = QpY + QpBdOffset, QpBdOffset = 6*(bitDepth-8);
        # VTM QpParam ctor, CommonLib/Quant.cpp)
        qp_eff = qp + 6 * (bd - 8)
        import jax.numpy as jnp
        coeff = np.asarray(transforms.fwd_transform_2d(
            jnp.asarray(resi[None]), bit_depth=bd))[0]
        q = np.asarray(quant.quant(jnp.asarray(coeff[None]), qp_eff,
                                   bit_depth=bd, is_irap=True))[0]
        cbf = bool(np.any(q))
        if cbf:
            dq = np.asarray(quant.dequant(jnp.asarray(q[None]), qp_eff,
                                          bit_depth=bd))[0]
            r = np.asarray(transforms.inv_transform_2d(
                jnp.asarray(dq[None]), bit_depth=bd))[0]
        else:
            r = np.zeros_like(pred)
        recon[y:y + cs, x:x + cs] = _clip_pel(pred + r, bd)

        # ----- syntax -----
        # coding_tree: no split possible (CU == CTU == minQT, mtt depth 0)
        #   -> split_cu_mode writes no bins
        # coding_unit (I slice, no IBC): no cu_skip_flag, pred_mode writes
        #   nothing, bdpcm off
        # intra_luma_pred_modes: mip/mrl/isp off ->
        #   intra_luma_mpm_flag = 1 (planar is MPM[0])
        enc.encode_bin(1, ctx_ids.IntraLumaMpmFlag[0])
        #   intra_luma_not_planar_flag = 0, ctx 1 (no ISP)
        enc.encode_bin(0, ctx_ids.IntraLumaPlanarFlag[0] + 1)
        # transform_tree: CU == maxTB -> single TU
        # cbf_comp luma, ctx offset 0
        enc.encode_bin(1 if cbf else 0, ctx_ids.QtCbf[0][0] + 0)
        if cbf:
            residual.write_residual_coding(enc, q, residual.LUMA,
                                           dep_quant=False,
                                           sign_hiding=False)
