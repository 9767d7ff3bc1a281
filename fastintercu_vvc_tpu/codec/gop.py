"""Sequence/GOP-level encoding: multi-frame streams, reference
management.

Capability parity: EncoderLib/EncGOP.cpp compressGOP (:1967) — POC
ordering, reference-list selection, AU assembly. Current scope: IPPP
low-delay with a sliding window of past references; the hierarchical-B
RA GOP-32 structure of the CTC config lands with B-slice support.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.bitstream import annexb, nal_unit
from . import encoder, hls


@dataclasses.dataclass
class SequenceResult:
    bitstream: bytes
    recons: list            # FrameResult per frame
    frame_bits: list
    frame_types: list

    @property
    def luma_recons(self):
        return [r.recon for r in self.recons]


def split_nals(bs: bytes) -> list[bytes]:
    """Split an annex-B stream into NAL payloads."""
    out = []
    i = 0
    n = len(bs)
    while i < n:
        if bs[i:i + 4] == b"\x00\x00\x00\x01":
            j = i + 4
        elif bs[i:i + 3] == b"\x00\x00\x01":
            j = i + 3
        else:
            i += 1
            continue
        k = j
        while k < n and bs[k:k + 4] != b"\x00\x00\x00\x01" \
                and bs[k:k + 3] != b"\x00\x00\x01":
            k += 1
        out.append(bs[j:k])
        i = k
    return out


class SequenceEncoder:
    """Low-delay IPPP encoder over a list of frames (luma planes)."""

    def __init__(self, cfg: hls.SeqConfig, intra_period: int = 0,
                 num_refs: int = 1, **enc_kwargs):
        self.cfg = cfg
        self.intra_period = intra_period   # 0 = first frame only
        self.num_refs = num_refs
        self.frame_encoder = encoder.FrameEncoder(cfg, **enc_kwargs)

    def encode(self, frames: list[np.ndarray],
               qp: int | None = None) -> SequenceResult:
        cfg = self.cfg
        nals = []
        recons, bits, types = [], [], []
        ref_queue: list[tuple[int, np.ndarray]] = []

        for poc, frame in enumerate(frames):
            is_intra = poc == 0 or (
                self.intra_period > 0 and poc % self.intra_period == 0)
            if is_intra:
                r = self.frame_encoder.encode_frame(
                    frame, poc=poc, qp=qp, slice_type=hls.I_SLICE)
                ref_queue = []
                types.append("I")
            else:
                refs = list(reversed(ref_queue[-self.num_refs:]))
                r = self.frame_encoder.encode_frame(
                    frame, poc=poc, qp=qp, slice_type=hls.P_SLICE,
                    refs=refs)
                types.append("P")
            frame_nals = split_nals(r.bitstream)
            if poc == 0:
                nals.extend(frame_nals[:2])       # SPS + PPS once
            nals.append(frame_nals[2])            # the slice NAL
            ref_queue.append((poc, r))
            recons.append(r)
            bits.append(r.num_bits)

        return SequenceResult(annexb(nals), recons, bits, types)
