"""High-level syntax (HLS) writers: SPS / PPS / picture header / slice
header, NAL assembly.

Behavioral parity: vtm-mlt-cpp/source/Lib/EncoderLib/VLCWriter.cpp —
codeSPS (:795), codePPS (:264), codePictureHeader (:1562),
codeSliceHeader (:2138), codeProfileTierLevel (:2671), dpb_parameters,
codeConstraintInfo; NAL types TypeDef.h:776-810.

The `SeqConfig` dataclass is the single source of truth for coding-tool
enablement; both the HLS writers and the CTU/residual syntax writers read
it (mirror of the reference's EncCfg ~1000-getter surface, reduced to the
fields that change bits).

Writers raise on combinations not yet supported instead of silently
emitting wrong bits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..utils.bitstream import BitWriter, nal_unit, annexb

# NAL unit types (spec Table 5; TypeDef.h:776-810)
NAL_TRAIL = 0
NAL_RADL = 2
NAL_RASL = 3
NAL_IDR_W_RADL = 7
NAL_IDR_N_LP = 8
NAL_CRA = 9
NAL_VPS = 14
NAL_SPS = 15
NAL_PPS = 16
NAL_PREFIX_APS = 17
NAL_PH = 19
NAL_SUFFIX_SEI = 24

B_SLICE, P_SLICE, I_SLICE = 0, 1, 2

CHROMA_400, CHROMA_420, CHROMA_422, CHROMA_444 = 0, 1, 2, 3


@dataclasses.dataclass
class SeqConfig:
    """Sequence-level configuration (SPS+PPS surface)."""

    def __post_init__(self):
        # clamp BT/TT ceilings to the CTU size (the SPS diff fields
        # sps_log2_diff_max_{bt,tt}_min_qt_* must stay within
        # CtbLog2SizeY - MinQtLog2SizeY)
        self.max_bt_intra = min(self.max_bt_intra, self.ctu_size)
        self.max_bt_inter = min(self.max_bt_inter, self.ctu_size)
        self.max_tt_intra = min(self.max_tt_intra, self.ctu_size)
        self.max_tt_inter = min(self.max_tt_inter, self.ctu_size)

    width: int = 64
    height: int = 64
    bit_depth: int = 10
    chroma_format: int = CHROMA_420
    ctu_size: int = 128
    log2_min_cu: int = 2
    # partition limits (CTC defaults, encoder_randomaccess_vtm.cfg)
    min_qt_intra: int = 8
    min_qt_inter: int = 8
    max_mtt_depth_intra: int = 0
    max_mtt_depth_inter: int = 0
    max_bt_intra: int = 32
    max_bt_inter: int = 128
    max_tt_intra: int = 32
    max_tt_inter: int = 64
    dual_tree_intra: bool = False
    log2_max_tb: int = 6          # 64 max transform
    # tools (all default off for the MVP; flip on as implemented)
    transform_skip: bool = False
    mts_intra: bool = False
    mts_inter: bool = False
    lfnst: bool = False
    sao: bool = False
    alf: bool = False
    ccalf: bool = False
    lmcs: bool = False
    joint_cbcr: bool = False
    dep_quant: bool = False
    sign_data_hiding: bool = False
    sbt: bool = False
    isp: bool = False
    mrl: bool = False
    mip: bool = False
    cclm: bool = False
    ibc: bool = False
    palette: bool = False
    # inter tools
    temporal_mvp: bool = False
    sbtmvp: bool = False
    amvr: bool = False
    bdof: bool = False
    smvd: bool = False
    dmvr: bool = False
    mmvd: bool = False
    affine: bool = False
    affine_type: bool = False
    prof: bool = False
    bcw: bool = False
    ciip: bool = False
    geo: bool = False
    max_merge_cand: int = 6
    max_geo_cand: int = 5
    max_affine_merge_cand: int = 5
    # conformance window (sps_conf_win_*, in SubWidthC/SubHeightC
    # chroma units): crops the coded picture back to the source size
    # when the source dims aren't multiples of max(8, minCU)
    conf_win_right: int = 0
    conf_win_bottom: int = 0
    # misc
    cu_qp_delta: bool = False     # per-QG (CTU) delta QP
    picture_hash: bool = False    # suffix-SEI MD5 per picture
    log2_max_poc_lsb: int = 8
    qp: int = 32                  # pps_init_qp
    deblocking: bool = False      # deblocking filter on/off
    wpp: bool = False             # entropy_coding_sync
    num_reorder_pics: int = 0
    max_dec_pic_buffering: int = 2
    level_idc: int = 102          # 6.2
    profile_idc: int = 1          # Main 10

    @property
    def log2_ctu(self) -> int:
        return self.ctu_size.bit_length() - 1

    @property
    def chroma_enabled(self) -> bool:
        return self.chroma_format != CHROMA_400

    @property
    def pic_width_in_ctus(self) -> int:
        return (self.width + self.ctu_size - 1) // self.ctu_size

    @property
    def pic_height_in_ctus(self) -> int:
        return (self.height + self.ctu_size - 1) // self.ctu_size


def coded_size(src_w: int, src_h: int, log2_min_cu: int = 2):
    """Round source dims up to the legal coded picture size (multiple
    of max(8, minCU); spec constraint on pps_pic_*_in_luma_samples)."""
    m = max(8, 1 << log2_min_cu)
    return (src_w + m - 1) // m * m, (src_h + m - 1) // m * m


def config_for_source(src_w: int, src_h: int, **kw) -> SeqConfig:
    """SeqConfig for an arbitrary source size: coded dims padded to the
    minimum-CB multiple, the conformance window cropping back to the
    source (EncApp xInitLibCfg conf-window derivation). The caller pads
    the source planes to (cfg.height, cfg.width) with edge replication
    (utils.yuv.pad_plane / VideoIOYuv::read padding)."""
    log2_min_cu = kw.get("log2_min_cu", 2)
    cw, ch = coded_size(src_w, src_h, log2_min_cu)
    chroma = kw.get("chroma_format", CHROMA_420)
    sub = 2 if chroma in (CHROMA_420, CHROMA_422) else 1
    kw.update(width=cw, height=ch,
              conf_win_right=(cw - src_w) // sub,
              conf_win_bottom=(ch - src_h) //
              (2 if chroma == CHROMA_420 else 1))
    return SeqConfig(**kw)


def _write_profile_tier_level(w: BitWriter, cfg: SeqConfig):
    """codeProfileTierLevel (VLCWriter.cpp:2671), profileTierPresent=1,
    maxNumSubLayersMinus1=0, gci_present_flag=0."""
    w.write(cfg.profile_idc, 7)         # general_profile_idc
    w.write_flag(0)                     # general_tier_flag (MAIN)
    w.write(cfg.level_idc, 8)           # general_level_idc
    w.write_flag(1)                     # ptl_frame_only_constraint_flag
    w.write_flag(0)                     # ptl_multilayer_enabled_flag
    # general_constraint_info: gci_present_flag=0 then byte-align
    w.write_flag(0)                     # gci_present_flag
    while w.num_bits % 8:
        w.write_flag(0)                 # gci_alignment_zero_bit
    # no sub-layers -> no sub_layer_level_present flags; already aligned
    w.write(0, 8)                       # ptl_num_sub_profiles


def write_sps(cfg: SeqConfig) -> bytes:
    """codeSPS parity (VLCWriter.cpp:795) for the supported tool subset."""
    w = BitWriter()
    w.write(0, 4)                       # sps_seq_parameter_set_id
    w.write(0, 4)                       # sps_video_parameter_set_id
    w.write(0, 3)                       # sps_max_sub_layers_minus1
    w.write(cfg.chroma_format, 2)       # sps_chroma_format_idc
    w.write(cfg.log2_ctu - 5, 2)        # sps_log2_ctu_size_minus5
    w.write_flag(1)                     # sps_ptl_dpb_hrd_params_present_flag
    _write_profile_tier_level(w, cfg)
    w.write_flag(0)                     # sps_gdr_enabled_flag
    w.write_flag(0)                     # sps_ref_pic_resampling_enabled_flag
    w.write_uvlc(cfg.width)             # sps_pic_width_max_in_luma_samples
    w.write_uvlc(cfg.height)            # sps_pic_height_max_in_luma_samples
    if cfg.conf_win_right or cfg.conf_win_bottom:
        w.write_flag(1)                 # sps_conformance_window_flag
        w.write_uvlc(0)                 # sps_conf_win_left_offset
        w.write_uvlc(cfg.conf_win_right)
        w.write_uvlc(0)                 # sps_conf_win_top_offset
        w.write_uvlc(cfg.conf_win_bottom)
    else:
        w.write_flag(0)                 # sps_conformance_window_flag
    w.write_flag(0)                     # sps_subpic_info_present_flag
    w.write_uvlc(cfg.bit_depth - 8)     # sps_bitdepth_minus8
    w.write_flag(1 if cfg.wpp else 0)   # sps_entropy_coding_sync_enabled_flag
    w.write_flag(0)                     # sps_entry_point_offsets_present_flag
    w.write(cfg.log2_max_poc_lsb - 4, 4)  # sps_log2_max_pic_order_cnt_lsb_minus4
    w.write_flag(0)                     # sps_poc_msb_cycle_flag
    w.write(0, 2)                       # sps_num_extra_ph_bytes
    w.write(0, 2)                       # sps_num_extra_sh_bytes
    # dpb_parameters (single sublayer)
    w.write_uvlc(cfg.max_dec_pic_buffering - 1)  # dpb_max_dec_pic_buffering_minus1
    w.write_uvlc(cfg.num_reorder_pics)  # dpb_max_num_reorder_pics
    w.write_uvlc(0)                     # dpb_max_latency_increase_plus1
    w.write_uvlc(cfg.log2_min_cu - 2)   # sps_log2_min_luma_coding_block_size_minus2
    w.write_flag(0)                     # sps_partition_constraints_override_enabled_flag
    log2_min_qt_i = cfg.min_qt_intra.bit_length() - 1
    log2_min_qt_b = cfg.min_qt_inter.bit_length() - 1
    w.write_uvlc(log2_min_qt_i - cfg.log2_min_cu)  # sps_log2_diff_min_qt_min_cb_intra_slice_luma
    w.write_uvlc(cfg.max_mtt_depth_intra)  # sps_max_mtt_hierarchy_depth_intra_slice_luma
    if cfg.max_mtt_depth_intra:
        w.write_uvlc(cfg.max_bt_intra.bit_length() - 1 - log2_min_qt_i)
        w.write_uvlc(cfg.max_tt_intra.bit_length() - 1 - log2_min_qt_i)
    if cfg.chroma_enabled:
        w.write_flag(1 if cfg.dual_tree_intra else 0)  # sps_qtbtt_dual_tree_intra_flag
    if cfg.dual_tree_intra:
        raise NotImplementedError("dual tree chroma partition signalling")
    w.write_uvlc(log2_min_qt_b - cfg.log2_min_cu)  # sps_log2_diff_min_qt_min_cb_inter_slice
    w.write_uvlc(cfg.max_mtt_depth_inter)  # sps_max_mtt_hierarchy_depth_inter_slice
    if cfg.max_mtt_depth_inter:
        w.write_uvlc(cfg.max_bt_inter.bit_length() - 1 - log2_min_qt_b)
        w.write_uvlc(cfg.max_tt_inter.bit_length() - 1 - log2_min_qt_b)
    if cfg.ctu_size > 32:
        w.write_flag(1 if cfg.log2_max_tb == 6 else 0)  # sps_max_luma_transform_size_64_flag
    w.write_flag(1 if cfg.transform_skip else 0)
    if cfg.transform_skip:
        w.write_uvlc(0)                 # sps_log2_transform_skip_max_size_minus2
        w.write_flag(0)                 # sps_bdpcm_enabled_flag
    w.write_flag(1 if (cfg.mts_intra or cfg.mts_inter) else 0)  # sps_mts_enabled_flag
    if cfg.mts_intra or cfg.mts_inter:
        w.write_flag(1 if cfg.mts_intra else 0)
        w.write_flag(1 if cfg.mts_inter else 0)
    w.write_flag(1 if cfg.lfnst else 0)
    if cfg.chroma_enabled:
        w.write_flag(1 if cfg.joint_cbcr else 0)  # sps_joint_cbcr_enabled_flag
        w.write_flag(1)                 # sps_same_qp_table_for_chroma_flag
        # single default chroma QP table: identity-ish 1-point table
        w.write_svlc(0)                 # sps_qp_table_starts_minus26
        w.write_uvlc(0)                 # sps_num_points_in_qp_table_minus1
        w.write_uvlc(0)                 # sps_delta_qp_in_val_minus1
        w.write_uvlc(0 ^ 0)             # sps_delta_qp_diff_val
    w.write_flag(1 if cfg.sao else 0)
    w.write_flag(1 if cfg.alf else 0)
    if cfg.alf and cfg.chroma_enabled:
        w.write_flag(1 if cfg.ccalf else 0)
    w.write_flag(1 if cfg.lmcs else 0)
    w.write_flag(0)                     # sps_weighted_pred_flag
    w.write_flag(0)                     # sps_weighted_bipred_flag
    w.write_flag(0)                     # sps_long_term_ref_pics_flag
    w.write_flag(0)                     # sps_idr_rpl_present_flag
    w.write_flag(0)                     # sps_rpl1_same_as_rpl0_flag
    w.write_uvlc(0)                     # sps_num_ref_pic_lists[0]
    w.write_uvlc(0)                     # sps_num_ref_pic_lists[1]
    w.write_flag(0)                     # sps_ref_wraparound_enabled_flag
    w.write_flag(1 if cfg.temporal_mvp else 0)
    if cfg.temporal_mvp:
        w.write_flag(1 if cfg.sbtmvp else 0)
    w.write_flag(1 if cfg.amvr else 0)
    w.write_flag(1 if cfg.bdof else 0)
    if cfg.bdof:
        w.write_flag(0)                 # sps_bdof_control_present_in_ph_flag
    w.write_flag(1 if cfg.smvd else 0)
    w.write_flag(1 if cfg.dmvr else 0)
    if cfg.dmvr:
        w.write_flag(0)                 # sps_dmvr_control_present_in_ph_flag
    w.write_flag(1 if cfg.mmvd else 0)
    if cfg.mmvd:
        w.write_flag(0)                 # sps_mmvd_fullpel_only_flag
    w.write_uvlc(6 - cfg.max_merge_cand)  # sps_six_minus_max_num_merge_cand
    w.write_flag(1 if cfg.sbt else 0)
    w.write_flag(1 if cfg.affine else 0)
    if cfg.affine:
        w.write_uvlc(5 - cfg.max_affine_merge_cand)
        w.write_flag(1 if cfg.affine_type else 0)
        if cfg.amvr:
            w.write_flag(0)             # sps_affine_amvr_enabled_flag
        w.write_flag(1 if cfg.prof else 0)
        if cfg.prof:
            w.write_flag(0)             # sps_prof_control_present_in_ph_flag
    w.write_flag(1 if cfg.bcw else 0)
    w.write_flag(1 if cfg.ciip else 0)
    if cfg.max_merge_cand >= 2:
        w.write_flag(1 if cfg.geo else 0)
        if cfg.geo and cfg.max_merge_cand >= 3:
            # sps_max_num_merge_cand_minus_max_num_gpm_cand
            w.write_uvlc(cfg.max_merge_cand - cfg.max_geo_cand)
    w.write_uvlc(0)                     # sps_log2_parallel_merge_level_minus2
    w.write_flag(1 if cfg.isp else 0)
    w.write_flag(1 if cfg.mrl else 0)
    w.write_flag(1 if cfg.mip else 0)
    if cfg.chroma_enabled:
        w.write_flag(1 if cfg.cclm else 0)
    if cfg.chroma_format == CHROMA_420:
        w.write_flag(1)                 # sps_chroma_horizontal_collocated_flag
        w.write_flag(0)                 # sps_chroma_vertical_collocated_flag
    w.write_flag(1 if cfg.palette else 0)
    if cfg.transform_skip or cfg.palette:
        w.write_uvlc(0)                 # sps_internal_bit_depth_minus_input_bit_depth
    w.write_flag(1 if cfg.ibc else 0)
    if cfg.ibc:
        w.write_uvlc(0)                 # sps_six_minus_max_num_ibc_merge_cand
    w.write_flag(0)                     # sps_ladf_enabled_flag
    w.write_flag(0)                     # sps_explicit_scaling_list_enabled_flag
    w.write_flag(1 if cfg.dep_quant else 0)
    w.write_flag(1 if cfg.sign_data_hiding else 0)
    w.write_flag(0)                     # sps_virtual_boundaries_enabled_flag
    w.write_flag(0)                     # sps_timing_hrd_params_present_flag
    w.write_flag(0)                     # sps_field_seq_flag
    w.write_flag(0)                     # sps_vui_parameters_present_flag
    w.write_flag(0)                     # sps_extension_present_flag
    w.write_byte_alignment()            # rbsp_trailing_bits
    return w.get_bytes()


def write_pps(cfg: SeqConfig) -> bytes:
    """codePPS parity (VLCWriter.cpp:264): one tile, one slice."""
    w = BitWriter()
    w.write(0, 6)                       # pps_pic_parameter_set_id
    w.write(0, 4)                       # pps_seq_parameter_set_id
    w.write_flag(0)                     # pps_mixed_nalu_types_in_pic_flag
    w.write_uvlc(cfg.width)             # pps_pic_width_in_luma_samples
    w.write_uvlc(cfg.height)            # pps_pic_height_in_luma_samples
    w.write_flag(0)                     # pps_conformance_window_flag
    w.write_flag(0)                     # pps_scaling_window_explicit_signalling_flag
    w.write_flag(0)                     # pps_output_flag_present_flag
    w.write_flag(1)                     # pps_no_pic_partition_flag
    w.write_flag(0)                     # pps_subpic_id_mapping_present_flag
    w.write_flag(0)                     # pps_cabac_init_present_flag
    w.write_uvlc(0)                     # pps_num_ref_idx_default_active_minus1[0]
    w.write_uvlc(0)                     # pps_num_ref_idx_default_active_minus1[1]
    w.write_flag(0)                     # pps_rpl1_idx_present_flag
    w.write_flag(0)                     # pps_weighted_pred_flag
    w.write_flag(0)                     # pps_weighted_bipred_flag
    w.write_flag(0)                     # pps_ref_wraparound_enabled_flag
    w.write_svlc(cfg.qp - 26)           # pps_init_qp_minus26
    w.write_flag(1 if cfg.cu_qp_delta else 0)  # pps_cu_qp_delta_enabled_flag
    w.write_flag(1 if cfg.chroma_enabled else 0)  # pps_chroma_tool_offsets_present_flag
    if cfg.chroma_enabled:
        w.write_svlc(0)                 # pps_cb_qp_offset
        w.write_svlc(0)                 # pps_cr_qp_offset
        w.write_flag(0)                 # pps_joint_cbcr_qp_offset_present_flag
        w.write_flag(0)                 # pps_slice_chroma_qp_offsets_present_flag
        w.write_flag(0)                 # pps_cu_chroma_qp_offset_list_enabled_flag
    # deblocking: control present so we can disable it entirely
    w.write_flag(1)                     # pps_deblocking_filter_control_present_flag
    w.write_flag(0)                     # pps_deblocking_filter_override_enabled_flag
    w.write_flag(0 if cfg.deblocking else 1)  # pps_deblocking_filter_disabled_flag
    if cfg.deblocking:
        w.write_svlc(0)                 # pps_beta_offset_div2
        w.write_svlc(0)                 # pps_tc_offset_div2
        if cfg.chroma_enabled:
            w.write_svlc(0)             # pps_cb_beta_offset_div2
            w.write_svlc(0)             # pps_cb_tc_offset_div2
            w.write_svlc(0)             # pps_cr_beta_offset_div2
            w.write_svlc(0)             # pps_cr_tc_offset_div2
    # no_pic_partition=1 -> no pps_*_info_in_ph flags
    w.write_flag(0)                     # pps_picture_header_extension_present_flag
    w.write_flag(0)                     # pps_slice_header_extension_present_flag
    w.write_flag(0)                     # pps_extension_flag
    w.write_byte_alignment()
    return w.get_bytes()


@dataclasses.dataclass
class PicConfig:
    """Per-picture state."""
    poc: int = 0
    slice_type: int = I_SLICE
    nal_type: int = NAL_IDR_N_LP
    qp: Optional[int] = None     # slice QP; default = cfg.qp
    is_irap: bool = True
    temporal_id: int = 0
    # L0/L1 reference identifiers (refPOC - currPOC; negative = past),
    # closest first; empty for I
    ref_deltas_l0: tuple = ()
    ref_deltas_l1: tuple = ()
    active_l0: int = 1          # NumRefIdxActive[0] (<= entries)
    active_l1: int = 1
    # ALF APS usage for this slice: number of luma APS ids (0 = fixed
    # filter sets only) and the ids themselves; chroma per-component
    # enables (the chroma filter comes from APS alf_aps_id_chroma = 0)
    alf_aps_ids: tuple = ()
    alf_cb: bool = False
    alf_cr: bool = False
    ccalf_cb: bool = False
    ccalf_cr: bool = False


def write_picture_header(w: BitWriter, cfg: SeqConfig, pic: PicConfig):
    """codePictureHeader parity (VLCWriter.cpp:1562) for the supported
    subset; written into the slice header (sh_picture_header_in_slice
    _header_flag=1), so no rbsp trailing here."""
    intra_only = pic.slice_type == I_SLICE
    w.write_flag(1 if pic.is_irap else 0)   # ph_gdr_or_irap_pic_flag
    w.write_flag(0)                     # ph_non_ref_pic_flag
    if pic.is_irap:
        w.write_flag(0)                 # ph_gdr_pic_flag
    w.write_flag(0 if intra_only else 1)  # ph_inter_slice_allowed_flag
    if not intra_only:
        w.write_flag(0)                 # ph_intra_slice_allowed_flag
    w.write_uvlc(0)                     # ph_pic_parameter_set_id
    w.write(pic.poc & ((1 << cfg.log2_max_poc_lsb) - 1),
            cfg.log2_max_poc_lsb)       # ph_pic_order_cnt_lsb
    # ALF info in SH; scaling lists off, virtual boundaries off,
    # output flag not present, rpl not in ph (no_pic_partition)
    if cfg.lmcs:
        w.write_flag(1)                 # ph_lmcs_enabled_flag
        w.write(0, 2)                   # ph_lmcs_aps_id
        if cfg.chroma_enabled:
            w.write_flag(1)             # ph_chroma_residual_scale_flag
    if intra_only:
        if cfg.cu_qp_delta:
            w.write_uvlc(0)             # ph_cu_qp_delta_subdiv_intra_slice
    else:
        # split-override absent; chroma offsets off
        if cfg.cu_qp_delta:
            w.write_uvlc(0)             # ph_cu_qp_delta_subdiv_inter_slice
        if cfg.temporal_mvp:
            w.write_flag(1)             # ph_temporal_mvp_enabled_flag
        # rpl in SH -> ph_mvd_l1_zero_flag present
        w.write_flag(0)                 # ph_mvd_l1_zero_flag
    # joint cbcr sign flag
    if cfg.joint_cbcr:
        w.write_flag(0)                 # ph_joint_cbcr_sign_flag
    # sao in SH, deblocking override off -> nothing more


def _write_rpl(w: BitWriter, deltas: tuple):
    """ref_pic_list_struct (xCodeRefPicList parity): STRP-only, no WP
    (forbidden-zero-delta form)."""
    w.write_uvlc(len(deltas))           # num_ref_entries
    prev = 0
    for i, d in enumerate(deltas):
        delta = d - prev if i else d    # delta vs previous entry
        prev = d
        abs_d = abs(delta)
        # without weighted prediction every entry uses the minus1 form
        # (xCodeRefPicList isForbiddenZeroDeltaPoc || ii == 0)
        w.write_uvlc(abs_d - 1)
        if abs_d > 0:
            w.write_flag(1 if delta < 0 else 0)  # strp_entry_sign_flag


def write_slice_header(cfg: SeqConfig, pic: PicConfig) -> BitWriter:
    """codeSliceHeader parity (VLCWriter.cpp:2138); PH in SH; returns the
    writer WITHOUT trailing bits (CABAC payload is appended after
    byte-alignment by the caller)."""
    w = BitWriter()
    w.write_flag(1)                     # sh_picture_header_in_slice_header_flag
    write_picture_header(w, cfg, pic)
    intra_only = pic.slice_type == I_SLICE
    if not intra_only:
        w.write_uvlc(pic.slice_type)    # sh_slice_type
    if pic.nal_type in (NAL_CRA, NAL_IDR_N_LP, NAL_IDR_W_RADL):
        w.write_flag(0)                 # sh_no_output_of_prior_pics_flag
    if cfg.alf:                         # sps on, alf info in SH
        w.write_flag(1)                 # sh_alf_enabled_flag
        w.write(len(pic.alf_aps_ids), 3)  # sh_num_alf_aps_ids_luma
        for aid in pic.alf_aps_ids:
            w.write(aid, 3)             # sh_alf_aps_id_luma[i]
        if cfg.chroma_enabled:
            w.write(1 if pic.alf_cb else 0, 1)  # sh_alf_cb_enabled_flag
            w.write(1 if pic.alf_cr else 0, 1)  # sh_alf_cr_enabled_flag
            if pic.alf_cb or pic.alf_cr:
                w.write(0, 3)           # sh_alf_aps_id_chroma
        if cfg.ccalf and cfg.chroma_enabled:
            w.write_flag(1 if pic.ccalf_cb else 0)  # sh_alf_cc_cb_enabled
            if pic.ccalf_cb:
                w.write(0, 3)           # sh_alf_cc_cb_aps_id
            w.write_flag(1 if pic.ccalf_cr else 0)  # sh_alf_cc_cr_enabled
            if pic.ccalf_cr:
                w.write(0, 3)           # sh_alf_cc_cr_aps_id
    # ref_pic_lists: present unless IDR (sps_idr_rpl_present=0) —
    # i.e. also for CRA I-slices, as empty lists (spec 7.3.7.1)
    if not intra_only or pic.nal_type not in (NAL_IDR_N_LP,
                                              NAL_IDR_W_RADL):
        _write_rpl(w, pic.ref_deltas_l0)
        _write_rpl(w, pic.ref_deltas_l1)
    if not intra_only:
        # num_ref_idx_active_override (VLCWriter.cpp:2380 area):
        # with pps defaults of 1, override is needed whenever more
        # than one reference should be active
        n0, n1 = len(pic.ref_deltas_l0), len(pic.ref_deltas_l1)
        is_b = pic.slice_type == B_SLICE
        override = (pic.active_l0 > 1) or (is_b and pic.active_l1 > 1)
        if (n0 > 1) or (is_b and n1 > 1):
            w.write_flag(1 if override else 0)
            if override:
                if n0 > 1:
                    w.write_uvlc(pic.active_l0 - 1)
                if is_b and n1 > 1:
                    w.write_uvlc(pic.active_l1 - 1)
        # cabac_init: pps flag 0 -> nothing
        if cfg.temporal_mvp:
            # collocated picture = L0 ref 0 (VLCWriter.cpp:2423);
            # ref idx present iff the ACTIVE count of the collocated
            # list exceeds 1
            if is_b:
                w.write_flag(1)         # sh_collocated_from_l0_flag
            if pic.active_l0 > 1:
                w.write_uvlc(0)         # sh_collocated_ref_idx
        # weighted pred off -> nothing
    # qp delta (pps_qp_delta_info_in_ph off)
    qp = pic.qp if pic.qp is not None else cfg.qp
    w.write_svlc(qp - cfg.qp)           # sh_qp_delta
    if cfg.sao:                         # sps on, sao info in SH
        w.write_flag(1)                 # sh_sao_luma_used_flag
        if cfg.chroma_enabled:
            w.write_flag(1)             # sh_sao_chroma_used_flag
    # deblocking control: override disabled -> nothing
    if cfg.dep_quant:
        w.write_flag(1)                 # sh_dep_quant_used_flag
    if cfg.sign_data_hiding and not cfg.dep_quant:
        w.write_flag(1)                 # sh_sign_data_hiding_used_flag
    if cfg.transform_skip and not cfg.dep_quant:
        w.write_flag(1)   # sh_ts_residual_coding_disabled_flag (RRC)
    return w


def slice_nal(cfg: SeqConfig, pic: PicConfig, cabac_payload: bytes,
              tail_bits) -> bytes:
    """Assemble the slice-layer RBSP: slice header + byte alignment +
    CABAC payload (+ engine tail bits) + rbsp trailing."""
    w = write_slice_header(cfg, pic)
    w.write_byte_alignment()            # sh byte_alignment: stop bit + zeros
    w.append_bytes(cabac_payload)
    val, nbits = tail_bits
    if nbits:
        w.write(val, nbits)
    w.write_byte_alignment()            # rbsp_slice_trailing_bits
    return nal_unit(w.get_bytes(), pic.nal_type, temporal_id=pic.temporal_id)


def sei_picture_hash_nal(recon_y, recon_cb=None, recon_cr=None,
                         temporal_id: int = 0) -> bytes:
    """Suffix-SEI decoded_picture_hash (MD5) NAL: payload type 132
    (SEIwrite.cpp:217 xWriteSEIDecodedPictureHash; PicYuvMD5.cpp
    md5_plane: samples little-endian, 2 bytes at 10-bit). The
    reference DecoderApp verifies this and prints [MD5:OK] per
    picture."""
    import hashlib
    import numpy as np
    planes = [recon_y]
    if recon_cb is not None:
        planes += [recon_cb, recon_cr]
    w = BitWriter()
    w.write(132, 8)                     # payload_type
    w.write(2 + 16 * len(planes), 8)    # payload_size
    w.write(0, 8)                       # dph_sei_hash_type = MD5
    w.write_flag(1 if len(planes) == 1 else 0)  # single_component
    w.write(0, 7)                       # reserved_zero_7bits
    for p in planes:
        digest = hashlib.md5(
            np.ascontiguousarray(p.astype("<u2")).tobytes()).digest()
        for byte in digest:
            w.write(byte, 8)
    w.write_byte_alignment()            # rbsp trailing bits
    # SEI TemporalId must equal the containing AU's (spec 7.4.2.2)
    return nal_unit(w.get_bytes(), NAL_SUFFIX_SEI,
                    temporal_id=temporal_id)


def write_aps_lmcs(cfg: SeqConfig, model) -> bytes:
    """APS RBSP carrying the LMCS data (codeAPS + codeLmcsAps,
    VLCWriter.cpp:487,613). model: ops.lmcs.LmcsModel."""
    w = BitWriter()
    w.write(1, 3)                       # aps_params_type = LMCS_APS
    w.write(0, 5)                       # adaptation_parameter_set_id
    chroma = 1 if cfg.chroma_enabled else 0
    w.write_flag(chroma)                # aps_chroma_present_flag
    min_bin, delta_max, prec_m1, deltas, crs = model.aps_fields()
    w.write_uvlc(min_bin)               # lmcs_min_bin_idx
    w.write_uvlc(delta_max)             # lmcs_delta_max_bin_idx
    w.write_uvlc(prec_m1)               # lmcs_delta_cw_prec_minus1
    for d in deltas:
        w.write(abs(d), prec_m1 + 1)    # lmcs_delta_abs_cw[i]
        if abs(d) > 0:
            w.write_flag(1 if d < 0 else 0)  # lmcs_delta_sign_cw_flag
    if chroma:
        w.write(abs(crs), 3)            # lmcs_delta_abs_crs
        if abs(crs) > 0:
            w.write_flag(1 if crs < 0 else 0)  # lmcs_delta_sign_crs
    w.write_flag(0)                     # aps_extension_flag
    w.write_byte_alignment()            # rbsp_trailing_bits
    return w.get_bytes()


def write_aps_alf(cfg: SeqConfig, luma=None, chroma_coeffs=None,
                  cc_cb=None, cc_cr=None, aps_id: int = 0) -> bytes:
    """APS RBSP carrying adaptive ALF filters (codeAPS + codeAlfAps +
    alfFilter, VLCWriter.cpp:498,524,3043).

    luma: None or (coeff_table [nf, 12] int, filt_map [25]);
    chroma_coeffs: None or [n_alt, 6] int; cc_cb/cc_cr: None or [7]
    power-of-two CC-ALF coefficients. Linear filters only
    (alf_luma_clip / alf_nonlinear_enable_flag_chroma = 0)."""
    w = BitWriter()
    w.write(0, 3)                       # aps_params_type = ALF_APS
    w.write(aps_id, 5)                  # adaptation_parameter_set_id
    chroma = 1 if cfg.chroma_enabled else 0
    w.write_flag(chroma)                # aps_chroma_present_flag
    w.write_flag(1 if luma is not None else 0)   # alf_luma_new_filter
    if chroma:
        w.write_flag(1 if chroma_coeffs is not None else 0)
        w.write_flag(1 if cc_cb is not None else 0)  # alf_cc_cb_signal
        w.write_flag(1 if cc_cr is not None else 0)  # alf_cc_cr_signal
    if luma is not None:
        coeff_table, filt_map = luma
        nf = len(coeff_table)
        w.write_flag(0)                 # alf_luma_clip (linear)
        w.write_uvlc(nf - 1)            # alf_luma_num_filters_signalled
        if nf > 1:
            length = (nf - 1).bit_length()  # ceilLog2(nf)
            for c in range(25):
                w.write(int(filt_map[c]), length)  # coeff_delta_idx
        for f in range(nf):
            for v in coeff_table[f]:
                w.write_uvlc(abs(int(v)))   # alf_luma_coeff_abs
                if v:
                    w.write_flag(1 if v < 0 else 0)  # coeff_sign
    if chroma_coeffs is not None:
        w.write_flag(0)                 # alf_nonlinear_enable_chroma
        w.write_uvlc(len(chroma_coeffs) - 1)  # alf_chroma_num_alts
        for alt in chroma_coeffs:
            for v in alt:
                w.write_uvlc(abs(int(v)))   # alf_chroma_coeff_abs
                if v:
                    w.write_flag(1 if v < 0 else 0)  # coeff_sign
    for cc in (cc_cb, cc_cr):
        if cc is None:
            continue
        w.write_uvlc(0)                 # alf_cc_*_filters_signalled
        for v in cc:                    # 7 mapped coefficients
            a = abs(int(v))
            if a == 0:
                w.write(0, 3)           # alf_cc_*_mapped_coeff_abs
            else:
                w.write(1 + (a.bit_length() - 1), 3)
                w.write_flag(1 if v < 0 else 0)  # alf_cc_*_coeff_sign
    w.write_flag(0)                     # aps_extension_flag
    w.write_byte_alignment()            # rbsp_trailing_bits
    return w.get_bytes()


def bitstream_for_frames(cfg: SeqConfig, frames: list,
                         extra_nals=()) -> bytes:
    """frames: list of (PicConfig, cabac_payload, tail_bits).
    extra_nals: (nal_type, rbsp) pairs emitted after the PPS (APS) —
    stamped with the AU's TemporalId (an APS NAL's tid must be >= the
    containing AU's tid, spec 7.4.2.2)."""
    au_tid = frames[0][0].temporal_id if frames else 0
    nals = [nal_unit(write_sps(cfg), NAL_SPS),
            nal_unit(write_pps(cfg), NAL_PPS)]
    for (t, rbsp) in extra_nals:
        nals.append(nal_unit(rbsp, t, temporal_id=au_tid))
    for pic, payload, tail in frames:
        nals.append(slice_nal(cfg, pic, payload, tail))
    return annexb(nals)
