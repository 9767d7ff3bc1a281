"""residual_coding syntax (regular residual coding, RRC).

Behavioral parity (normative, spec §7.3.11.11 + §9.3.4.2.x context
derivations): vtm-mlt-cpp/source/Lib/EncoderLib/CABACWriter.cpp
residual_coding (:2624), residual_coding_subblock, last_sig_coeff;
context machinery CommonLib/ContextModelling.{h,cpp} (CoeffCodingContext
ctor, initSubblock, sigCtxIdAbs :108, ctxOffsetAbs :152, templateAbsSum
:166); tables Rom.cpp g_uiGroupIdx/g_uiMinInGroup/g_auiGoRiceParsCoeff,
Rom.h g_auiGoRicePosCoeff0; engine BinEncoder.cpp encodeRemAbsEP.

Covers: dep-quant on/off (state machine), sign-data-hiding off, MTS/SBT
zero-out handling at the last-position and CG levels. Transform-skip
residual coding (TSRC) is a separate module.

Python reference implementation operating on a numpy [H, W] coefficient
block; the batched RDO bit-estimator mirrors this in JAX.
"""

from __future__ import annotations

import functools

import numpy as np

from ..ops import rom
from . import ctx_ids

LUMA, CHROMA = 0, 1

GROUP_IDX = np.asarray(
    [0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7] +
    [8] * 8 + [9] * 8 + [10] * 16 + [11] * 16, np.int32)
MIN_IN_GROUP = np.asarray([0, 1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96],
                          np.int32)
GO_RICE_PARS = np.asarray(
    [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3], np.int32)
COEF_REMAIN_BIN_REDUCTION = 5
MAX_LOG2_TR_DYNAMIC_RANGE = 15
CTX_BIN_SAMPLE_RATIO = 28      # MAX_TU_LEVEL_CTX_CODED_BIN_CONSTRAINT_*
ZERO_OUT_TH = 32
# dependent-quant state transition table (stateTransTab 32040 bit-packed)
DQ_STATE_TAB = 32040


def go_rice_pos_coeff0(state: int, rice: int) -> int:
    return (1 if state < 2 else 2) << rice


class CoeffCtx:
    """Mirror of CoeffCodingContext for one TU component."""

    def __init__(self, width: int, height: int, ch_type: int):
        self.width = width
        self.height = height
        self.ch = ch_type
        lw, lh = width.bit_length() - 1, height.bit_length() - 1
        self.log2_cg_w, self.log2_cg_h = rom.log2_sbb_size(lw, lh)
        self.log2_cg_size = self.log2_cg_w + self.log2_cg_h
        self.width_in_groups = min(ZERO_OUT_TH, width) >> self.log2_cg_w
        self.height_in_groups = min(ZERO_OUT_TH, height) >> self.log2_cg_h
        self.max_num_coeff = width * height
        # scans: coefficient scan (grouped), CG scan (ungrouped)
        self.scan = rom.scan_diag(width, height)          # [n, 2] (x, y)
        self.scan_cg = rom.scan_diag_ungrouped(self.width_in_groups,
                                               self.height_in_groups)
        self.max_last_x = int(GROUP_IDX[min(ZERO_OUT_TH, width) - 1])
        self.max_last_y = int(GROUP_IDX[min(ZERO_OUT_TH, height) - 1])
        if ch_type == CHROMA:
            self.last_shift_x = min(2, max(0, width >> 3))
            self.last_shift_y = min(2, max(0, height >> 3))
            self.last_off_x = self.last_off_y = 0
        else:
            prefix_ctx = [0, 0, 0, 3, 6, 10, 15, 21]
            self.last_off_x = prefix_ctx[lw]
            self.last_off_y = prefix_ctx[lh]
            self.last_shift_x = (lw + 1) >> 2
            self.last_shift_y = (lh + 1) >> 2
        # context set bases
        self.ctx_last_x = ctx_ids.LastX[ch_type][0]
        self.ctx_last_y = ctx_ids.LastY[ch_type][0]
        self.ctx_sig = [ctx_ids.SigFlag[ch_type][0],
                        ctx_ids.SigFlag[ch_type + 2][0],
                        ctx_ids.SigFlag[ch_type + 4][0]]
        self.ctx_par = ctx_ids.ParFlag[ch_type][0]
        self.ctx_gt2 = ctx_ids.GtxFlag[ch_type][0]
        self.ctx_gt1 = ctx_ids.GtxFlag[ch_type + 2][0]
        self.ctx_sig_group = ctx_ids.SigCoeffGroup[ch_type][0]
        # state
        self.tmpl_diag = -1
        self.tmpl_sum1 = -1
        self.sig_group_flags_grid = set()  # set of cg idx (pos in grid)
        self.reg_bin_limit = 0

    # ---- subblock state ----
    def init_subblock(self, subset_id: int, sig_group: bool):
        self.subset_id = subset_id
        cgx, cgy = (int(v) for v in self.scan_cg[subset_id])
        self.cg_pos_x, self.cg_pos_y = cgx, cgy
        cg_pos = cgy * self.width_in_groups + cgx
        self.subset_pos = cg_pos
        self.min_sub_pos = subset_id << self.log2_cg_size
        self.max_sub_pos = self.min_sub_pos + (1 << self.log2_cg_size) - 1
        if sig_group:
            self.sig_group_flags_grid.add(cg_pos)
        sig_right = (cg_pos + 1) in self.sig_group_flags_grid \
            if (cgx + 1) < self.width_in_groups else False
        sig_lower = (cg_pos + self.width_in_groups) in self.sig_group_flags_grid \
            if (cgy + 1) < self.height_in_groups else False
        self.sig_group_ctx = self.ctx_sig_group + (1 if (sig_right or sig_lower) else 0)

    def block_pos(self, scan_pos: int):
        x, y = (int(v) for v in self.scan[scan_pos])
        return x, y

    def sig_ctx_id_abs(self, scan_pos: int, coeff: np.ndarray,
                       state: int) -> int:
        x, y = self.block_pos(scan_pos)
        w, h = self.width, self.height
        diag = x + y
        sum_abs = 0
        num_pos = 0

        def upd(cx, cy):
            nonlocal sum_abs, num_pos
            a = abs(int(coeff[cy][cx]))
            sum_abs += min(4 + (a & 1), a)
            num_pos += int(a != 0)

        if x < w - 1:
            upd(x + 1, y)
            if x < w - 2:
                upd(x + 2, y)
            if y < h - 1:
                upd(x + 1, y + 1)
        if y < h - 1:
            upd(x, y + 1)
            if y < h - 2:
                upd(x, y + 2)

        ctx_ofs = min((sum_abs + 1) >> 1, 3) + (4 if diag < 2 else 0)
        if self.ch == LUMA:
            ctx_ofs += 4 if diag < 5 else 0
        self.tmpl_diag = diag
        self.tmpl_sum1 = sum_abs - num_pos
        return self.ctx_sig[max(0, state - 1)] + ctx_ofs

    def ctx_offset_abs(self) -> int:
        offset = 0
        if self.tmpl_diag != -1:
            offset = min(self.tmpl_sum1, 4) + 1
            if self.tmpl_diag == 0:
                offset += 15 if self.ch == LUMA else 5
            elif self.ch == LUMA:
                offset += 10 if self.tmpl_diag < 3 else (5 if self.tmpl_diag < 10 else 0)
        return offset

    def template_abs_sum(self, scan_pos: int, coeff: np.ndarray,
                         base_level: int) -> int:
        x, y = self.block_pos(scan_pos)
        w, h = self.width, self.height
        s = 0
        if x < w - 1:
            s += abs(int(coeff[y][x + 1]))
            if x < w - 2:
                s += abs(int(coeff[y][x + 2]))
            if y < h - 1:
                s += abs(int(coeff[y + 1][x + 1]))
        if y < h - 1:
            s += abs(int(coeff[y + 1][x]))
            if y < h - 2:
                s += abs(int(coeff[y + 2][x]))
        return max(min(s - 5 * base_level, 31), 0)


def encode_rem_abs_ep(enc, bins: int, rice: int,
                      cutoff: int = COEF_REMAIN_BIN_REDUCTION,
                      max_log2_tr_range: int = MAX_LOG2_TR_DYNAMIC_RANGE):
    """BinEncoderBase::encodeRemAbsEP parity (Golomb-Rice + EG(k))."""
    threshold = cutoff << rice
    if bins < threshold:
        length = (bins >> rice) + 1
        enc.encode_bins_ep((1 << length) - 2, length)
        if rice:
            enc.encode_bins_ep(bins & ((1 << rice) - 1), rice)
    else:
        max_prefix_len = 32 - cutoff - max_log2_tr_range
        prefix_len = 0
        code_value = (bins >> rice) - cutoff
        if code_value >= (1 << max_prefix_len) - 1:
            prefix_len = max_prefix_len
            suffix_len = max_log2_tr_range
        else:
            while code_value > (2 << prefix_len) - 2:
                prefix_len += 1
            suffix_len = prefix_len + rice + 1
        total_prefix_len = prefix_len + cutoff
        bit_mask = (1 << rice) - 1
        prefix = (1 << total_prefix_len) - 1
        suffix = ((code_value - ((1 << prefix_len) - 1)) << rice) | (bins & bit_mask)
        enc.encode_bins_ep(prefix, total_prefix_len)
        enc.encode_bins_ep(suffix, suffix_len)


def write_last_sig_coeff(enc, cctx: CoeffCtx, last_x: int, last_y: int):
    """last_sig_coeff parity (CABACWriter.cpp:~2570)."""
    gx = int(GROUP_IDX[last_x])
    gy = int(GROUP_IDX[last_y])
    for c in range(gx):
        enc.encode_bin(1, cctx.ctx_last_x + cctx.last_off_x + (c >> cctx.last_shift_x))
    if gx < cctx.max_last_x:
        enc.encode_bin(0, cctx.ctx_last_x + cctx.last_off_x + (gx >> cctx.last_shift_x))
    for c in range(gy):
        enc.encode_bin(1, cctx.ctx_last_y + cctx.last_off_y + (c >> cctx.last_shift_y))
    if gy < cctx.max_last_y:
        enc.encode_bin(0, cctx.ctx_last_y + cctx.last_off_y + (gy >> cctx.last_shift_y))
    if gx > 3:
        px = last_x - int(MIN_IN_GROUP[gx])
        for i in range(((gx - 2) >> 1) - 1, -1, -1):
            enc.encode_bin_ep((px >> i) & 1)
    if gy > 3:
        py = last_y - int(MIN_IN_GROUP[gy])
        for i in range(((gy - 2) >> 1) - 1, -1, -1):
            enc.encode_bin_ep((py >> i) & 1)


def _native_ctxb(w: int, h: int, ch: int) -> list[int]:
    """Context-base vector for native/residual_ops.c (index layout
    documented there)."""
    lw, lh = w.bit_length() - 1, h.bit_length() - 1
    if ch == CHROMA:
        off_x = off_y = 0
        sh_x = min(2, max(0, w >> 3))
        sh_y = min(2, max(0, h >> 3))
    else:
        prefix = [0, 0, 0, 3, 6, 10, 15, 21]
        off_x, off_y = prefix[lw], prefix[lh]
        sh_x, sh_y = (lw + 1) >> 2, (lh + 1) >> 2
    return [ctx_ids.LastX[ch][0], ctx_ids.LastY[ch][0],
            ctx_ids.SigFlag[ch][0], ctx_ids.SigFlag[ch + 2][0],
            ctx_ids.SigFlag[ch + 4][0],
            ctx_ids.ParFlag[ch][0],
            ctx_ids.GtxFlag[ch + 2][0],      # gt1
            ctx_ids.GtxFlag[ch][0],          # gt2
            ctx_ids.SigCoeffGroup[ch][0],
            off_x, off_y, sh_x, sh_y,
            int(GROUP_IDX[min(ZERO_OUT_TH, w) - 1]),
            int(GROUP_IDX[min(ZERO_OUT_TH, h) - 1])]


def apply_sign_hiding(coeff: np.ndarray) -> np.ndarray:
    """Quant::xSignBitHidingHDQ parity at the bitstream level
    (Quant.cpp:222): per coding group with lastNZ-firstNZ >= 4, the
    sign of the first (lowest-scan) nonzero is inferred from the
    parity of the group's level sum — adjust a level so the parity
    matches. Encoder choice: bump |last nonzero| by one (VTM picks the
    RD-cheapest coefficient; the normative decode only needs parity)."""
    h, w = coeff.shape
    sx, sy, gsize = _sbh_scan(w, h)
    q = coeff.copy()
    vals = q[sy, sx].reshape(-1, gsize)               # [groups, gsize]
    nzm = vals != 0
    has = nzm.any(axis=1)
    first = np.argmax(nzm, axis=1)
    last = gsize - 1 - np.argmax(nzm[:, ::-1], axis=1)
    idx = np.arange(gsize)
    within = (idx >= first[:, None]) & (idx <= last[:, None])
    gsum = (vals * within).sum(axis=1)
    sign_bit = (vals[np.arange(len(vals)), first] < 0).astype(np.int64)
    need = has & (last - first >= SBH_THRESHOLD) & (sign_bit != (gsum & 1))
    for g in np.nonzero(need)[0]:
        p = g * gsize + last[g]
        gx, gy = int(sx[p]), int(sy[p])
        q[gy, gx] += 1 if q[gy, gx] > 0 else -1
    return q


@functools.lru_cache(maxsize=None)
def _sbh_scan(w, h):
    """Scan x/y index vectors + group size for sign hiding."""
    cctx = CoeffCtx(w, h, LUMA)      # scan layout only (ch-independent)
    scan = np.asarray(cctx.scan)
    return (np.ascontiguousarray(scan[:, 0]),
            np.ascontiguousarray(scan[:, 1]), 1 << cctx.log2_cg_size)


SBH_THRESHOLD = 4


def write_residual_coding(enc, coeff: np.ndarray, ch_type: int,
                          dep_quant: bool = False,
                          sign_hiding: bool = False):
    """Write one TU component's coefficients. coeff: [H, W] int array
    (already quantized levels). Assumes at least one nonzero coeff.
    Caller handles ts_flag/mts signalling separately. sign_hiding:
    sh_sign_data_hiding_used_flag semantics — the caller must have run
    apply_sign_hiding on the levels first."""
    h, w = coeff.shape

    # recorder target + no dep-quant -> generate the op stream
    # natively (SDH streams included: the C generator models the
    # hidden-sign rule; the caller already parity-adjusted the levels)
    if not dep_quant:
        from .. import native
        if hasattr(enc, "extend_ops"):
            if native.get_lib() is not None:
                lgw, lgh = rom.log2_sbb_size(w.bit_length() - 1,
                                             h.bit_length() - 1)
                enc.extend_ops(native.residual_ops(
                    coeff, ch_type, lgw, lgh,
                    _native_ctxb(w, h, ch_type),
                    sign_hiding=int(sign_hiding)))
                return
        elif hasattr(enc, "bits_left"):
            # LIVE engine (the RD trial-coding path): generate the op
            # stream natively and execute it natively, resuming from
            # and updating the encoder's arithmetic + context state —
            # bit-identical to the per-bin Python path below
            if native.get_lib() is not None:
                lgw, lgh = rom.log2_sbb_size(w.bit_length() - 1,
                                             h.bit_length() - 1)
                ops = native.residual_ops(
                    coeff, ch_type, lgw, lgh,
                    _native_ctxb(w, h, ch_type),
                    sign_hiding=int(sign_hiding))
                native.cabac_exec_live(enc, ops)
                return
    cctx = CoeffCtx(w, h, ch_type)

    # last position + sig group flags in scan order
    scan = cctx.scan
    vals = coeff[scan[:, 1], scan[:, 0]]
    nz = np.nonzero(vals)[0]
    assert len(nz), "residual coding called for empty TU"
    scan_pos_last = int(nz[-1])
    sig_groups = set(int(p) >> cctx.log2_cg_size for p in nz)

    last_x, last_y = cctx.block_pos(scan_pos_last)
    write_last_sig_coeff(enc, cctx, last_x, last_y)

    state_tab = DQ_STATE_TAB if dep_quant else 0
    state = 0
    # zero-out area doesn't count toward the regular-bin budget
    tb_zo_w = min(ZERO_OUT_TH, w)
    tb_zo_h = min(ZERO_OUT_TH, h)
    cctx.reg_bin_limit = (tb_zo_w * tb_zo_h * CTX_BIN_SAMPLE_RATIO) >> 4

    for subset_id in range(scan_pos_last >> cctx.log2_cg_size, -1, -1):
        cctx.init_subblock(subset_id, subset_id in sig_groups)
        state = _write_subblock(enc, cctx, coeff, state_tab, state,
                                scan_pos_last, sign_hiding)


def _write_subblock(enc, cctx: CoeffCtx, coeff: np.ndarray,
                    state_tab: int, state: int, scan_pos_last: int,
                    sign_hiding: bool = False) -> int:
    min_sub_pos = cctx.min_sub_pos
    is_last = (scan_pos_last >> cctx.log2_cg_size) == cctx.subset_id
    first_sig_pos = scan_pos_last if is_last else cctx.max_sub_pos
    next_sig_pos = first_sig_pos

    is_not_first = cctx.subset_id > 0
    is_sig_group = cctx.subset_pos in cctx.sig_group_flags_grid
    if not is_last and is_not_first:
        enc.encode_bin(1 if is_sig_group else 0, cctx.sig_group_ctx)
        if not is_sig_group:
            return state

    ctx_offsets = {}
    infer_sig_pos = (min_sub_pos if is_not_first else -1) \
        if next_sig_pos != scan_pos_last else next_sig_pos
    num_non_zero = 0
    first_nz_pos = next_sig_pos
    last_nz_pos = -1
    sign_pattern = 0
    rem_reg_bins = cctx.reg_bin_limit

    def coeff_at(pos):
        x, y = cctx.block_pos(pos)
        return int(coeff[y][x])

    while next_sig_pos >= min_sub_pos and rem_reg_bins >= 4:
        c = coeff_at(next_sig_pos)
        sig = 1 if c != 0 else 0
        if num_non_zero or next_sig_pos != infer_sig_pos:
            sig_ctx = cctx.sig_ctx_id_abs(next_sig_pos, coeff, state)
            enc.encode_bin(sig, sig_ctx)
            rem_reg_bins -= 1
        elif next_sig_pos != scan_pos_last:
            cctx.sig_ctx_id_abs(next_sig_pos, coeff, state)

        if sig:
            ctx_off = cctx.ctx_offset_abs()
            ctx_offsets[next_sig_pos] = ctx_off
            num_non_zero += 1
            first_nz_pos = next_sig_pos
            last_nz_pos = max(last_nz_pos, next_sig_pos)
            rem_abs = abs(c) - 1
            if next_sig_pos != scan_pos_last:
                sign_pattern <<= 1
            if c < 0:
                sign_pattern += 1
            gt1 = 1 if rem_abs else 0
            enc.encode_bin(gt1, cctx.ctx_gt1 + ctx_off)
            rem_reg_bins -= 1
            if gt1:
                rem_abs -= 1
                enc.encode_bin(rem_abs & 1, cctx.ctx_par + ctx_off)
                rem_abs >>= 1
                rem_reg_bins -= 1
                gt2 = 1 if rem_abs else 0
                enc.encode_bin(gt2, cctx.ctx_gt2 + ctx_off)
                rem_reg_bins -= 1
        state = (state_tab >> ((state << 2) + ((c & 1) << 1))) & 3
        next_sig_pos -= 1

    first_pos_mode2 = next_sig_pos
    cctx.reg_bin_limit = rem_reg_bins

    # 2nd pass: go-rice remainders for levels >= 4
    for pos in range(first_sig_pos, first_pos_mode2, -1):
        sum_all = cctx.template_abs_sum(pos, coeff, 4)
        rice = int(GO_RICE_PARS[sum_all])
        abs_level = abs(coeff_at(pos))
        if abs_level >= 4:
            encode_rem_abs_ep(enc, (abs_level - 4) >> 1, rice)

    # bypass pass for positions past the regular-bin budget
    for pos in range(first_pos_mode2, min_sub_pos - 1, -1):
        c = coeff_at(pos)
        abs_level = abs(c)
        sum_all = cctx.template_abs_sum(pos, coeff, 0)
        rice = int(GO_RICE_PARS[sum_all])
        pos0 = go_rice_pos_coeff0(state, rice)
        rem = pos0 if abs_level == 0 else \
            (abs_level - 1 if abs_level <= pos0 else abs_level)
        encode_rem_abs_ep(enc, rem, rice)
        state = (state_tab >> ((state << 2) + ((abs_level & 1) << 1))) & 3
        if abs_level:
            num_non_zero += 1
            first_nz_pos = pos
            last_nz_pos = max(last_nz_pos, pos)
            sign_pattern <<= 1
            if c < 0:
                sign_pattern += 1

    # signs (the first nonzero's sign is hidden when SDH applies,
    # CABACWriter.cpp:3011-3017)
    num_signs = num_non_zero
    if sign_hiding and num_non_zero \
            and (last_nz_pos - first_nz_pos) >= 4:
        num_signs -= 1
        sign_pattern >>= 1
    if num_signs:
        enc.encode_bins_ep(sign_pattern, num_signs)
    return state
