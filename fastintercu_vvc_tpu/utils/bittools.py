"""Bitstream surgery utilities (App-level parity with the reference's
SEIRemovalApp, Parcat, and App/utils annexB tools — SURVEY.md §2.7).

All functions operate on annex-B byte strings. VVC NAL header: two
bytes — forbidden_zero(1) + reserved(1) + layer_id(6), then
nal_unit_type(5) + tid_plus1(3) (spec 7.3.1.2; TypeDef.h:776-810).
"""

from __future__ import annotations

NAL_NAMES = {
    0: "TRAIL", 1: "STSA", 2: "RADL", 3: "RASL",
    7: "IDR_W_RADL", 8: "IDR_N_LP", 9: "CRA", 10: "GDR",
    12: "OPI", 13: "DCI", 14: "VPS", 15: "SPS", 16: "PPS",
    17: "PREFIX_APS", 18: "SUFFIX_APS", 19: "PH", 20: "AUD",
    21: "EOS", 22: "EOB", 23: "PREFIX_SEI", 24: "SUFFIX_SEI",
    25: "FD",
}
PARAM_SET_TYPES = (13, 14, 15, 16, 17, 18)
SEI_TYPES = (23, 24)
IDR_TYPES = (7, 8)


def split_annexb(bs: bytes) -> list[bytes]:
    """Annex-B stream -> NAL payloads (start codes stripped)."""
    out = []
    i, n = 0, len(bs)
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


def join_annexb(nals: list[bytes]) -> bytes:
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def nal_type(nal: bytes) -> int:
    return nal[1] >> 3


def nal_temporal_id(nal: bytes) -> int:
    return (nal[1] & 7) - 1


def list_nals(bs: bytes) -> list[dict]:
    """Annex-B inventory (App/utils annexB byte counter parity):
    one entry per NAL with type/name/tid/size."""
    out = []
    for nal in split_annexb(bs):
        t = nal_type(nal)
        out.append({"type": t, "name": NAL_NAMES.get(t, f"RSV{t}"),
                    "tid": nal_temporal_id(nal), "bytes": len(nal) + 4})
    return out


def remove_sei(bs: bytes) -> bytes:
    """SEIRemovalApp parity: drop all prefix/suffix SEI NAL units."""
    return join_annexb([n for n in split_annexb(bs)
                        if nal_type(n) not in SEI_TYPES])


def parcat(streams: list[bytes]) -> bytes:
    """Parcat parity for IDR-aligned segments: concatenate encodes
    that each begin with an IDR, keeping the first stream's parameter
    sets and dropping duplicates from later segments. (POC LSBs reset
    at each IDR, so no slice rewriting is needed — the reference tool
    additionally rewrites POCs for non-IDR joins.)"""
    out: list[bytes] = []
    for si, bs in enumerate(streams):
        nals = split_annexb(bs)
        if si > 0:
            body = [n for n in nals
                    if nal_type(n) not in PARAM_SET_TYPES]
            first_vcl = next((nal_type(n) for n in body
                              if nal_type(n) <= 12), None)
            if first_vcl not in IDR_TYPES:
                raise ValueError(
                    f"segment {si} does not start with an IDR "
                    f"(type {first_vcl}); POC rewriting not supported")
            nals = body
        out.extend(nals)
    return join_annexb(out)
