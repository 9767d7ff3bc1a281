"""Intra frame encoder with full QTMT partition search: monochrome
(4:0:0), QT/BT/TT recursive partitioning, 67-mode intra with MPM
signalling, DCT2 + scalar quant, no in-loop filters. Produces VVC
bitstreams the reference VTM-11 DecoderApp decodes bit-exactly to our
own reconstruction.

RD search: trial-encode with CABAC state snapshot/rollback — cost =
SSD(recon) + lambda * exact_bits (the sequential analogue of VTM
EncCu::xCompressCU's best/temp CodingStructure machinery,
EncCu.cpp:541). The batched TPU search replaces this loop; syntax
writers and kernels are shared.

Syntax parity chain: CABACWriter::coding_tree / split_cu_mode (:567) /
coding_unit / intra_luma_pred_modes / transform_unit / residual_coding.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import intra, transforms, quant
from . import cabac, contexts, ctx_ids, hls, partition, residual


@dataclasses.dataclass
class FrameResult:
    bitstream: bytes
    recon: np.ndarray
    num_bits: int
    cu_map: np.ndarray | None = None   # per-4x4 (w<<16|h) for inspection


def _clip_pel(x, bit_depth):
    return np.clip(x, 0, (1 << bit_depth) - 1)


def write_trunc_bin(enc, symbol: int, max_symbol: int):
    """xWriteTruncBinCode parity (bypass truncated binary)."""
    thresh = max_symbol.bit_length() - 1
    val = 1 << thresh
    b = max_symbol - val
    if symbol < val - b:
        enc.encode_bins_ep(symbol, thresh)
    else:
        symbol += val - b
        enc.encode_bins_ep(symbol, thresh + 1)


def write_intra_luma_mode(enc, mode: int, mpm: list[int]):
    """intra_luma_pred_modes parity (no MIP/MRL/ISP)."""
    mpm_idx = mpm.index(mode) if mode in mpm else 6
    enc.encode_bin(1 if mpm_idx < 6 else 0, ctx_ids.IntraLumaMpmFlag[0])
    if mpm_idx < 6:
        enc.encode_bin(1 if mpm_idx > 0 else 0,
                       ctx_ids.IntraLumaPlanarFlag[0] + 1)
        if mpm_idx:
            enc.encode_bin_ep(1 if mpm_idx > 1 else 0)
        if mpm_idx > 1:
            enc.encode_bin_ep(1 if mpm_idx > 2 else 0)
        if mpm_idx > 2:
            enc.encode_bin_ep(1 if mpm_idx > 3 else 0)
        if mpm_idx > 3:
            enc.encode_bin_ep(1 if mpm_idx > 4 else 0)
    else:
        sorted_mpm = sorted(mpm)
        m = mode
        for idx in range(5, -1, -1):
            if m > sorted_mpm[idx]:
                m -= 1
        write_trunc_bin(enc, m, intra.NUM_LUMA_MODE - 6)


class _EncState:
    """Snapshot/rollback of CABAC engine + contexts (RD trial encode).

    A snapshot taken at a point *after* `base` carries the byte suffix
    written since `base`, so committing a previously-evaluated branch
    after rolling back re-appends its bytes."""

    @staticmethod
    def save(enc: cabac.CabacEncoder, base_out_len: int = 0):
        return (enc.low, enc.range, enc.buffered_byte,
                enc.num_buffered_bytes, enc.bits_left, base_out_len,
                bytes(enc.out[base_out_len:]),
                enc.ctx.state0.copy(), enc.ctx.state1.copy())

    @staticmethod
    def restore(enc: cabac.CabacEncoder, s):
        (enc.low, enc.range, enc.buffered_byte, enc.num_buffered_bytes,
         enc.bits_left, base_out_len, suffix, s0, s1) = s
        del enc.out[base_out_len:]
        enc.out.extend(suffix)
        enc.ctx.state0[:] = s0
        enc.ctx.state1[:] = s1

    @staticmethod
    def bits(enc: cabac.CabacEncoder) -> int:
        return 8 * (len(enc.out) + enc.num_buffered_bytes) + \
            (23 - enc.bits_left)


class _Maps:
    """Per-4x4-unit SoA state for neighbor-dependent derivations
    (replaces VTM's CU pointer graph; SURVEY.md §7.1 SoA stance)."""

    def __init__(self, w, h):
        self.gw, self.gh = w // 4, h // 4
        self.cu_w = np.zeros((self.gh, self.gw), np.int32)
        self.cu_h = np.zeros((self.gh, self.gw), np.int32)
        self.qt_d = np.full((self.gh, self.gw), -1, np.int32)
        self.mode = np.full((self.gh, self.gw), -1, np.int32)
        self.coded = np.zeros((self.gh, self.gw), bool)

    def mark_cu(self, x, y, w, h, qt_depth, mode):
        sx, sy = x // 4, y // 4
        self.cu_w[sy:sy + h // 4, sx:sx + w // 4] = w
        self.cu_h[sy:sy + h // 4, sx:sx + w // 4] = h
        self.qt_d[sy:sy + h // 4, sx:sx + w // 4] = qt_depth
        self.mode[sy:sy + h // 4, sx:sx + w // 4] = mode
        self.coded[sy:sy + h // 4, sx:sx + w // 4] = True

    def region(self, x, y, w, h):
        sx, sy = x // 4, y // 4
        sl = np.s_[sy:sy + h // 4, sx:sx + w // 4]
        return (self.cu_w[sl].copy(), self.cu_h[sl].copy(),
                self.qt_d[sl].copy(), self.mode[sl].copy(),
                self.coded[sl].copy())

    def restore_region(self, x, y, w, h, saved):
        sx, sy = x // 4, y // 4
        sl = np.s_[sy:sy + h // 4, sx:sx + w // 4]
        (self.cu_w[sl], self.cu_h[sl], self.qt_d[sl], self.mode[sl],
         self.coded[sl]) = saved

    def _at(self, x, y):
        if x < 0 or y < 0 or x // 4 >= self.gw or y // 4 >= self.gh:
            return None
        if not self.coded[y // 4, x // 4]:
            return None
        return y // 4, x // 4

    def cu_size(self, x, y):
        p = self._at(x, y)
        if p is None:
            return None
        return int(self.cu_w[p]), int(self.cu_h[p])

    def qt_depth(self, x, y):
        p = self._at(x, y)
        return None if p is None else int(self.qt_d[p])

    def intra_mode(self, x, y):
        p = self._at(x, y)
        if p is None:
            return None
        m = int(self.mode[p])
        return None if m < 0 else m


class IntraFrameEncoder:
    """Encodes I-frames with QTMT partition search."""

    def __init__(self, cfg: hls.SeqConfig, num_mode_cands: int = 3):
        assert cfg.chroma_format == hls.CHROMA_400, "4:0:0 only for now"
        assert cfg.width % cfg.ctu_size == 0
        assert cfg.height % cfg.ctu_size == 0
        assert cfg.ctu_size <= 64, "CTU 128 needs implicit TU split (TODO)"
        self.cfg = cfg
        self.pc = partition.PartitionConstraints(
            ctu_size=cfg.ctu_size, min_cu=1 << cfg.log2_min_cu,
            min_qt=cfg.min_qt_intra, max_mtt_depth=cfg.max_mtt_depth_intra,
            max_bt_size=cfg.max_bt_intra, max_tt_size=cfg.max_tt_intra,
            max_tb_size=1 << cfg.log2_max_tb)
        self.num_mode_cands = num_mode_cands

    def encode_frame(self, org: np.ndarray, poc: int = 0,
                     qp: int | None = None) -> FrameResult:
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        H, W = org.shape
        assert (H, W) == (cfg.height, cfg.width)
        cs = cfg.ctu_size

        self.org = org.astype(np.int32)
        self.recon = np.zeros((H, W), np.int32)
        self.maps = _Maps(W, H)
        self.qp = qp
        self.qp_eff = qp + 6 * (cfg.bit_depth - 8)
        self.lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)

        bank = contexts.init_bank(contexts.I_SLICE, qp)
        enc = cabac.CabacEncoder(bank)
        self.enc = enc

        for y in range(0, H, cs):
            for x in range(0, W, cs):
                self._compress_cu(x, y, cs, cs, 0, 0, partition.QT_SPLIT,
                                  None)

        enc.encode_bin_trm(1)
        payload = enc.finish()
        pic = hls.PicConfig(poc=poc, slice_type=hls.I_SLICE,
                            nal_type=hls.NAL_IDR_N_LP, qp=qp)
        bs = hls.bitstream_for_frames(cfg, [(pic, payload, enc.tail_bits())])
        cu_map = (self.maps.cu_w.astype(np.int64) << 16) | self.maps.cu_h
        return FrameResult(bs, self.recon, len(bs) * 8, cu_map)

    # ------------------------------------------------------------------
    def _compress_cu(self, x, y, w, h, qt_depth, mtt_depth, last_split,
                     tt_mid) -> float:
        """Encode the best coding choice for this block into self.enc,
        updating recon/maps. Returns RD cost."""
        enc = self.enc
        cans = partition.can_split(w, h, qt_depth, mtt_depth, self.pc,
                                   last_split, tt_mid)
        can_no, can_qt, can_bh, can_bv, can_th, can_tv = cans
        ctxs = partition.split_ctx(self.maps, x, y, w, h, qt_depth,
                                   mtt_depth, cans)

        options = []
        if can_no:
            options.append(partition.NO_SPLIT)
        if can_qt:
            options.append(partition.QT_SPLIT)
        if can_bh:
            options.append(partition.BT_H)
        if can_bv:
            options.append(partition.BT_V)
        if can_th:
            options.append(partition.TT_H)
        if can_tv:
            options.append(partition.TT_V)

        best = None          # (cost, enc_state_end, recon_region, maps_region)
        base_len = len(enc.out)
        base_state = _EncState.save(enc, base_len)
        base_bits = _EncState.bits(enc)
        recon_save = self.recon[y:y + h, x:x + w].copy()
        maps_save = self.maps.region(x, y, w, h)

        for split in options:
            partition.write_split_mode(enc, split, cans, ctxs)
            if split == partition.NO_SPLIT:
                ssd = self._encode_leaf(x, y, w, h, qt_depth)
                cost = ssd + self.lam * (_EncState.bits(enc) - base_bits)
            else:
                ssd = 0.0
                for i, (cx, cy, cw, ch) in enumerate(
                        partition.split_children(x, y, w, h, split)):
                    nqt = qt_depth + 1 if split == partition.QT_SPLIT else qt_depth
                    nmt = mtt_depth if split == partition.QT_SPLIT else mtt_depth + 1
                    tmid = None
                    if split in (partition.TT_H, partition.TT_V) and i == 1:
                        tmid = partition.BT_H if split == partition.TT_H \
                            else partition.BT_V
                        nmt = mtt_depth + 1  # VTM: middle TT child +1 only? (see note)
                    self._compress_cu(cx, cy, cw, ch, nqt, nmt, split, tmid)
                cost = self._region_ssd(x, y, w, h) + \
                    self.lam * (_EncState.bits(enc) - base_bits)

            if best is None or cost < best[0]:
                best = (cost, _EncState.save(enc, base_len),
                        self.recon[y:y + h, x:x + w].copy(),
                        self.maps.region(x, y, w, h))
            # rollback for next option
            _EncState.restore(enc, base_state)
            self.recon[y:y + h, x:x + w] = recon_save
            self.maps.restore_region(x, y, w, h, maps_save)

        # commit best
        cost, end_state, recon_best, maps_best = best
        _EncState.restore(enc, end_state)
        self.recon[y:y + h, x:x + w] = recon_best
        self.maps.restore_region(x, y, w, h, maps_best)
        return cost

    def _region_ssd(self, x, y, w, h) -> float:
        d = (self.org[y:y + h, x:x + w]
             - self.recon[y:y + h, x:x + w]).astype(np.int64)
        return float((d * d).sum())

    # ------------------------------------------------------------------
    # mode pool for the SAD prescreen when not sweeping all 67
    _FAST_POOL = [0, 1, 2, 10, 18, 26, 34, 42, 50, 58, 66]

    def _mode_candidates(self, blk, top, left, w, h, mpm):
        """SAD prescreen over a mode pool + MPMs; top-N go to full RD
        (mirrors VTM's SATD pre-pass, IntraSearch). The batched TPU
        search evaluates all 67 in one tensor op instead."""
        pool = sorted(set(self._FAST_POOL) | set(mpm))
        sads = []
        preds = {}
        for m in pool:
            p = intra.predict(m, top, left, w, h, self.cfg.bit_depth)
            preds[m] = p
            sads.append((int(np.abs(blk - p).sum()), m))
        sads.sort()
        cands = [m for _, m in sads[:self.num_mode_cands]]
        for m in mpm[:2]:
            if m not in cands:
                cands.append(m)
        return cands, preds

    def _encode_leaf(self, x, y, w, h, qt_depth) -> float:
        """Choose the best intra mode (RD over candidates), write the CU
        syntax, reconstruct. Returns SSD."""
        enc = self.enc
        cfg = self.cfg
        bd = cfg.bit_depth
        blk = self.org[y:y + h, x:x + w]

        top, left = intra.build_refs(self.recon, x, y, w, h, bd,
                                     self._avail_mask(x, y, w, h))
        left_mode = self.maps.intra_mode(x - 1, y + h - 1)
        ctu = cfg.ctu_size
        if (y % ctu) == 0:
            above_mode = None     # above PU outside this CTU
        else:
            above_mode = self.maps.intra_mode(x + w - 1, y - 1)
        mpm = intra.get_intra_mpms(left_mode, above_mode)

        cands, preds = self._mode_candidates(blk, top, left, w, h, mpm)

        import jax.numpy as jnp
        base_len = len(enc.out)
        base_state = _EncState.save(enc, base_len)
        base_bits = _EncState.bits(enc)
        best = None
        for m in cands:
            pred = preds[m]
            resi = blk - pred
            coeff = np.asarray(transforms.fwd_transform_2d(
                jnp.asarray(resi[None]), bit_depth=bd))[0]
            q = np.asarray(quant.quant(jnp.asarray(coeff[None]),
                                       self.qp_eff, bit_depth=bd,
                                       is_irap=True))[0]
            cbf = bool(np.any(q))
            if cbf:
                dq = np.asarray(quant.dequant(jnp.asarray(q[None]),
                                              self.qp_eff, bit_depth=bd))[0]
                r = np.asarray(transforms.inv_transform_2d(
                    jnp.asarray(dq[None]), bit_depth=bd))[0]
            else:
                r = np.zeros_like(pred)
            recon = _clip_pel(pred + r, bd)
            ssd = float(((blk - recon).astype(np.int64) ** 2).sum())

            write_intra_luma_mode(enc, m, mpm)
            enc.encode_bin(1 if cbf else 0, ctx_ids.QtCbf[0][0])
            if cbf:
                residual.write_residual_coding(enc, q, residual.LUMA)
            cost = ssd + self.lam * (_EncState.bits(enc) - base_bits)
            if best is None or cost < best[0]:
                best = (cost, m, ssd, recon, _EncState.save(enc, base_len))
            _EncState.restore(enc, base_state)

        cost, m, ssd, recon, end_state = best
        _EncState.restore(enc, end_state)
        self.recon[y:y + h, x:x + w] = recon
        self.maps.mark_cu(x, y, w, h, qt_depth, m)
        return ssd

    def _avail_mask(self, cux, cuy, cuw, cuh):
        """Reference availability for a CU inside the frame: a sample is
        available iff its 4x4 unit is already coded (maps.coded)."""
        maps = self.maps

        def mask(bx, by):
            if bx < 0 or by < 0:
                return False
            if bx // 4 >= maps.gw or by // 4 >= maps.gh:
                return False
            return bool(maps.coded[by // 4, bx // 4])
        return mask
