"""Bit-level bitstream writer/reader + NAL encapsulation.

Parity targets: vtm-mlt-cpp/source/Lib/CommonLib/BitStream.cpp
(OutputBitstream::write, emulation prevention in
writeNaluContent/addEmulationPreventionByte paths) and
EncoderLib/NALwrite.cpp + AnnexBwrite.h (start codes).
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit writer (OutputBitstream parity)."""

    def __init__(self):
        self._bytes = bytearray()
        self._held = 0       # bits accumulated, < 8
        self._held_bits = 0

    def write(self, value: int, num_bits: int):
        if num_bits == 0:
            return
        assert 0 <= value < (1 << num_bits), (value, num_bits)
        acc = (self._held << num_bits) | value
        nbits = self._held_bits + num_bits
        while nbits >= 8:
            nbits -= 8
            self._bytes.append((acc >> nbits) & 0xFF)
        self._held = acc & ((1 << nbits) - 1)
        self._held_bits = nbits

    def write_flag(self, flag: int):
        self.write(1 if flag else 0, 1)

    def write_uvlc(self, value: int):
        """ue(v) exp-Golomb."""
        assert value >= 0
        code = value + 1
        length = code.bit_length()
        self.write(0, length - 1)
        self.write(code, length)

    def write_svlc(self, value: int):
        """se(v) signed exp-Golomb."""
        code = (value << 1) - 1 if value > 0 else (-value) << 1
        self.write_uvlc(code)

    def write_byte_alignment(self):
        """rbsp_trailing_bits: stop bit then zero-pad to byte."""
        self.write(1, 1)
        self.align_zero()

    def align_zero(self):
        if self._held_bits:
            self.write(0, 8 - self._held_bits)

    @property
    def num_bits(self) -> int:
        return len(self._bytes) * 8 + self._held_bits

    def byte_aligned(self) -> bool:
        return self._held_bits == 0

    def append_bytes(self, data: bytes):
        assert self.byte_aligned()
        self._bytes.extend(data)

    def get_bytes(self) -> bytes:
        assert self.byte_aligned(), "stream not byte aligned"
        return bytes(self._bytes)


class BitReader:
    """MSB-first reader (InputBitstream parity)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, num_bits: int) -> int:
        v = 0
        for _ in range(num_bits):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def read_flag(self) -> int:
        return self.read(1)

    def read_uvlc(self) -> int:
        zeros = 0
        while self.read(1) == 0:
            zeros += 1
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.read(zeros)

    def read_svlc(self) -> int:
        code = self.read_uvlc()
        return (code + 1) >> 1 if code & 1 else -(code >> 1)


def add_emulation_prevention(rbsp: bytes) -> bytes:
    """Insert 0x03 after any 0x0000 followed by a byte <= 0x03
    (spec §7.4.1.1; VTM NALwrite.cpp writeNalUnit)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def strip_emulation_prevention(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 0x03 and i + 1 < len(ebsp) and ebsp[i + 1] <= 0x03:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def nal_unit(rbsp: bytes, nal_unit_type: int, layer_id: int = 0,
             temporal_id: int = 0) -> bytes:
    """VVC NAL header (2 bytes, spec §7.3.1.2) + EBSP payload."""
    hdr = bytes([
        (0 << 7) | (layer_id & 0x3F),                     # forbidden_zero + nuh_layer_id
        ((nal_unit_type & 0x1F) << 3) | ((temporal_id + 1) & 0x7),
    ])
    return hdr + add_emulation_prevention(rbsp)


def annexb(nals: list[bytes], first_long_startcode: bool = True) -> bytes:
    """Concatenate NAL units with Annex-B start codes."""
    out = bytearray()
    for i, nal in enumerate(nals):
        out.extend(b"\x00\x00\x00\x01" if (i == 0 or first_long_startcode)
                   else b"\x00\x00\x01")
        out.extend(nal)
    return bytes(out)
