"""VTM/CTC-style configuration-file support.

Capability parity with Utilities/program_options_lite
(program_options_lite.cpp:485-583 cfg scanner) and the EncAppCfg option
surface (EncAppCfg.cpp:582): `Key : value  # comment` lines, multiple
`-c` files layered left-to-right, CLI overrides on top. Option names
follow the reference encoder's cfg vocabulary
(cfg/encoder_randomaccess_vtm.cfg) for the tool subset this framework
implements; unknown keys are collected, not fatal (the CTC files carry
many options outside any single build's feature set).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from . import hls


def _b(v: str) -> bool:
    return int(v) != 0


# cfg key -> (SeqConfig field | special, parser)
_SEQ_KEYS = {
    "SourceWidth": ("width", int),
    "SourceHeight": ("height", int),
    "InternalBitDepth": ("bit_depth", int),
    "CTUSize": ("ctu_size", int),
    "MaxCUWidth": ("ctu_size", int),
    "QP": ("qp", int),
    "DepQuant": ("dep_quant", _b),
    "TransformSkip": ("transform_skip", _b),
    "SAO": ("sao", _b),
    "ALF": ("alf", _b),
    "CCALF": ("ccalf", _b),
    "LMCSEnable": ("lmcs", _b),
    "JointCbCr": ("joint_cbcr", _b),
    "SBT": ("sbt", _b),
    "ISP": ("isp", _b),
    "MRL": ("mrl", _b),
    "MIP": ("mip", _b),
    "LMChroma": ("cclm", _b),
    "LFNST": ("lfnst", _b),
    "MTS": ("mts_intra", lambda v: int(v) in (1, 3)),
    "TMVPMode": ("temporal_mvp", _b),
    "SbTMVP": ("sbtmvp", _b),
    "IMV": ("amvr", _b),
    "BIO": ("bdof", _b),
    "SMVD": ("smvd", _b),
    "DMVR": ("dmvr", _b),
    "MMVD": ("mmvd", _b),
    "Affine": ("affine", _b),
    "AffineType": ("affine_type", _b),
    "PROF": ("prof", _b),
    "BCW": ("bcw", _b),
    "CIIP": ("ciip", _b),
    "Geo": ("geo", _b),
    "IBC": ("ibc", _b),
    "MaxNumMergeCand": ("max_merge_cand", int),
    "MaxNumGeoCand": ("max_geo_cand", int),
    "LoopFilterDisable": ("deblocking", lambda v: int(v) == 0),
    "WaveFrontSynchro": ("wpp", _b),
    "SEIDecodedPictureHash": ("picture_hash", _b),
    "MinQTISlice": ("min_qt_intra", int),
    "MinQTNonISlice": ("min_qt_inter", int),
    "MaxMTTHierarchyDepth": ("max_mtt_depth_inter", int),
    "MaxMTTHierarchyDepthISliceL": ("max_mtt_depth_intra", int),
}

# keys that drive the encoding run rather than the SPS/PPS surface
_RUN_KEYS = {
    "InputFile": ("input", str),
    "BitstreamFile": ("bitstream", str),
    "ReconFile": ("recon", str),
    "FrameRate": ("fps", float),
    "FramesToBeEncoded": ("frames", int),
    "IntraPeriod": ("intra_period", int),
    "GOPSize": ("gop_size", int),
    "SearchRange": ("search_range", int),
    "TemporalFilter": ("mctf", _b),
    "InputBitDepth": ("input_bit_depth", int),
    "RateControl": ("rate_control", _b),
    "TargetBitrate": ("target_bitrate", int),
}


@dataclasses.dataclass
class EncoderRunConfig:
    """Everything a CTC-style encode run needs: the sequence/tool
    surface (SeqConfig) plus the run parameters."""
    seq: hls.SeqConfig
    run: dict
    unknown: dict


def parse_cfg_file(path: str) -> dict[str, str]:
    """One cfg file -> {key: raw value} (program_options_lite
    `Key : value  # comment` grammar)."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if ":" not in line:
                continue
            key, val = line.split(":", 1)
            out[key.strip()] = val.strip()
    return out


def load(cfg_files: list[str], overrides: dict[str, Any] | None = None
         ) -> EncoderRunConfig:
    """Layer cfg files left-to-right (later wins, like repeated -c),
    then apply explicit overrides ({cfg key or SeqConfig field: val})."""
    raw: dict[str, str] = {}
    for p in cfg_files:
        raw.update(parse_cfg_file(p))

    seq_kwargs: dict[str, Any] = {}
    run: dict[str, Any] = {}
    unknown: dict[str, str] = {}
    for key, val in raw.items():
        if key in _SEQ_KEYS:
            field, conv = _SEQ_KEYS[key]
            seq_kwargs[field] = conv(val)
        elif key in _RUN_KEYS:
            field, conv = _RUN_KEYS[key]
            run[field] = conv(val)
        else:
            unknown[key] = val

    for key, val in (overrides or {}).items():
        if key in _SEQ_KEYS:
            field, conv = _SEQ_KEYS[key]
            seq_kwargs[field] = conv(str(val))
        elif key in _RUN_KEYS:
            field, conv = _RUN_KEYS[key]
            run[field] = conv(str(val))
        else:
            seq_kwargs[key] = val          # direct SeqConfig field

    # constraints the SeqConfig asserts on
    if seq_kwargs.get("chroma_format", hls.CHROMA_420) != hls.CHROMA_400:
        seq_kwargs.setdefault("log2_min_cu", 3)
    # partial CTUs are not supported yet: shrink the CTU to fit
    w = seq_kwargs.get("width", 64)
    h = seq_kwargs.get("height", 64)
    ctu = seq_kwargs.get("ctu_size", 128)
    while ctu > 32 and (w % ctu or h % ctu):
        ctu //= 2
    seq_kwargs["ctu_size"] = ctu
    seq = hls.SeqConfig(**seq_kwargs)
    return EncoderRunConfig(seq=seq, run=run, unknown=unknown)
