"""VVC CABAC arithmetic engine — bit-exact encoder + decoder.

Behavioral parity (normative, ISO/IEC 23090-3 §9.3.4):
  - encoder: vtm-mlt-cpp/source/Lib/EncoderLib/BinEncoder.cpp
    (start :~103, encodeBin :354, encodeBinEP/BinsEP/AlignedBinsEP,
    encodeBinTrm, writeOut carry-propagation, finish)
  - decoder: source/Lib/DecoderLib/BinDecoder.cpp (start, decodeBin,
    decodeBinEP/BinsEP/AlignedBinsEP, decodeBinTrm)
  - probability model: source/Lib/CommonLib/Contexts.h BinProbModel_Std
    (two-rate 10+14-bit states, getLPS, update; init Contexts.cpp:~270)

This pure-Python engine is the executable specification and test oracle;
the production final-write path is the native C++ engine in
native/cabac_engine.cpp driving the same op-stream format (the final
CABAC write is the one intrinsically serial piece of the encoder; RDO
uses the vectorized JAX bit-estimator instead, never this).

Context state layout is SoA (three uint16 numpy arrays), matching the
framework's batch-first design: a whole slice's context bank is a small
vector, checkpointable for WPP-style context save/restore.
"""

from __future__ import annotations

import numpy as np

PROB_BITS = 15
PROB_BITS_0 = 10
PROB_BITS_1 = 14
MASK_0 = ((1 << PROB_BITS_0) - 1) << (PROB_BITS - PROB_BITS_0)
MASK_1 = ((1 << PROB_BITS_1) - 1) << (PROB_BITS - PROB_BITS_1)
DWS = 8

RENORM_TABLE_32 = np.array(
    [6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1], np.uint8)


class ContextBank:
    """SoA bank of BinProbModel_Std states."""

    def __init__(self, num_ctx: int):
        half = 1 << (PROB_BITS - 1)
        self.state0 = np.full(num_ctx, half & MASK_0, np.uint16)
        self.state1 = np.full(num_ctx, half & MASK_1, np.uint16)
        self.rate = np.full(num_ctx, DWS, np.uint8)

    def init_ctx(self, idx: int, qp: int, init_id: int,
                 log2_window: int = None):
        """BinProbModel_Std::init (Contexts.cpp): slope/offset from the
        6-bit spec initValue, qp-dependent."""
        slope = (init_id >> 3) - 4
        offset = ((init_id & 7) * 18) + 1
        inistate = ((slope * (qp - 16)) >> 1) + offset
        state_clip = min(127, max(1, inistate))
        p1 = state_clip << 8
        self.state0[idx] = p1 & MASK_0
        self.state1[idx] = p1 & MASK_1
        if log2_window is not None:
            rate0 = 2 + ((log2_window >> 2) & 3)
            rate1 = 3 + rate0 + (log2_window & 3)
            self.rate[idx] = 16 * rate0 + rate1

    def init_all(self, qp: int, init_ids: np.ndarray,
                 log2_windows: np.ndarray):
        for i, (iv, ws) in enumerate(zip(init_ids, log2_windows)):
            self.init_ctx(i, qp, int(iv), int(ws))

    # -- model queries (scalar, for the python engine) --
    def state8(self, idx: int) -> int:
        return (int(self.state0[idx]) + int(self.state1[idx])) >> 8

    def mps(self, idx: int) -> int:
        return self.state8(idx) >> 7

    def get_lps(self, idx: int, rng: int) -> int:
        q = self.state8(idx)
        if q & 0x80:
            q = q ^ 0xFF
        return ((q >> 2) * (rng >> 5) >> 1) + 4

    def update(self, idx: int, bin_: int):
        rate0 = int(self.rate[idx]) >> 4
        rate1 = int(self.rate[idx]) & 15
        s0, s1 = int(self.state0[idx]), int(self.state1[idx])
        s0 -= (s0 >> rate0) & MASK_0
        s1 -= (s1 >> rate1) & MASK_1
        if bin_:
            s0 += (0x7FFF >> rate0) & MASK_0
            s1 += (0x7FFF >> rate1) & MASK_1
        self.state0[idx] = s0
        self.state1[idx] = s1

    def copy(self) -> "ContextBank":
        c = ContextBank(len(self.state0))
        c.state0 = self.state0.copy()
        c.state1 = self.state1.copy()
        c.rate = self.rate.copy()
        return c


class CabacEncoder:
    """BinEncoderBase + TBinEncoder<BinProbModel_Std> parity."""

    def __init__(self, ctx: ContextBank | None = None):
        self.ctx = ctx if ctx is not None else ContextBank(0)
        self.out = bytearray()
        self.start()

    def start(self):
        self.low = 0
        self.range = 510
        self.buffered_byte = 0xFF
        self.num_buffered_bytes = 0
        self.bits_left = 23

    def _write_out(self):
        lead_byte = self.low >> (24 - self.bits_left)
        self.bits_left += 8
        self.low &= 0xFFFFFFFF >> self.bits_left
        if lead_byte == 0xFF:
            self.num_buffered_bytes += 1
        else:
            if self.num_buffered_bytes > 0:
                carry = lead_byte >> 8
                byte = self.buffered_byte + carry
                self.buffered_byte = lead_byte & 0xFF
                self.out.append(byte & 0xFF)
                byte = (0xFF + carry) & 0xFF
                while self.num_buffered_bytes > 1:
                    self.out.append(byte)
                    self.num_buffered_bytes -= 1
            else:
                self.num_buffered_bytes = 1
                self.buffered_byte = lead_byte & 0xFF

    def encode_bin(self, bin_: int, ctx_id: int):
        lps = self.ctx.get_lps(ctx_id, self.range)
        self.range -= lps
        if bin_ != self.ctx.mps(ctx_id):
            num_bits = int(RENORM_TABLE_32[lps >> 3])
            self.bits_left -= num_bits
            self.low += self.range
            self.low <<= num_bits
            self.range = lps << num_bits
            if self.bits_left < 12:
                self._write_out()
        else:
            if self.range < 256:
                self.bits_left -= 1
                self.low <<= 1
                self.range <<= 1
                if self.bits_left < 12:
                    self._write_out()
        self.ctx.update(ctx_id, bin_)

    def encode_bin_ep(self, bin_: int):
        self.low <<= 1
        if bin_:
            self.low += self.range
        self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def encode_bins_ep(self, bins: int, num_bins: int):
        if self.range == 256:
            self._encode_aligned_bins_ep(bins, num_bins)
            return
        while num_bins > 8:
            num_bins -= 8
            pattern = bins >> num_bins
            self.low <<= 8
            self.low += self.range * pattern
            bins -= pattern << num_bins
            self.bits_left -= 8
            if self.bits_left < 12:
                self._write_out()
        self.low <<= num_bins
        self.low += self.range * bins
        self.bits_left -= num_bins
        if self.bits_left < 12:
            self._write_out()

    def _encode_aligned_bins_ep(self, bins: int, num_bins: int):
        rem = num_bins
        while rem > 0:
            n = min(rem, 8)
            mask = (1 << n) - 1
            new_bins = (bins >> (rem - n)) & mask
            self.low = (self.low << n) + (new_bins << 8)
            rem -= n
            self.bits_left -= n
            if self.bits_left < 12:
                self._write_out()

    def encode_bin_trm(self, bin_: int):
        self.range -= 2
        if bin_:
            self.low += self.range
            self.low <<= 7
            self.range = 2 << 7
            self.bits_left -= 7
        elif self.range >= 256:
            return
        else:
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def finish(self) -> bytes:
        if self.low >> (32 - self.bits_left):
            self.out.append((self.buffered_byte + 1) & 0xFF)
            while self.num_buffered_bytes > 1:
                self.out.append(0x00)
                self.num_buffered_bytes -= 1
            self.low -= 1 << (32 - self.bits_left)
        else:
            if self.num_buffered_bytes > 0:
                self.out.append(self.buffered_byte)
            while self.num_buffered_bytes > 1:
                self.out.append(0xFF)
                self.num_buffered_bytes -= 1
        # write (24 - bits_left) bits of low >> 8, MSB first, into bytes.
        nbits = 24 - self.bits_left
        val = (self.low >> 8) & ((1 << nbits) - 1) if nbits > 0 else 0
        self._tail_bits = (val, nbits)
        return bytes(self.out)

    def tail_bits(self):
        """(value, nbits) still to append after finish() — the caller's
        bit-level writer integrates them (parity: m_Bitstream->write(
        m_Low >> 8, 24 - m_bitsLeft))."""
        return self._tail_bits


class CabacDecoder:
    """BinDecoderBase + TBinDecoder<BinProbModel_Std> parity.

    data must start at a byte-aligned position of the slice payload.
    """

    def __init__(self, data: bytes, ctx: ContextBank | None = None):
        self.ctx = ctx if ctx is not None else ContextBank(0)
        self.data = data
        self.pos = 0
        self.range = 510
        self.value = (self._read_byte() << 8) + self._read_byte()
        self.bits_needed = -8

    def _read_byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode_bin(self, ctx_id: int) -> int:
        bin_ = self.ctx.mps(ctx_id)
        lps = self.ctx.get_lps(ctx_id, self.range)
        self.range -= lps
        sr = self.range << 7
        if self.value < sr:
            if self.range < 256:
                self.range <<= 1
                self.value <<= 1
                self.bits_needed += 1
                if self.bits_needed >= 0:
                    self.value += self._read_byte() << self.bits_needed
                    self.bits_needed -= 8
        else:
            bin_ = 1 - bin_
            num_bits = int(RENORM_TABLE_32[lps >> 3])
            self.value -= sr
            self.value <<= num_bits
            self.range = lps << num_bits
            self.bits_needed += num_bits
            if self.bits_needed >= 0:
                self.value += self._read_byte() << self.bits_needed
                self.bits_needed -= 8
        self.ctx.update(ctx_id, bin_)
        return bin_

    def decode_bin_ep(self) -> int:
        self.value += self.value
        self.bits_needed += 1
        if self.bits_needed >= 0:
            self.value += self._read_byte()
            self.bits_needed = -8
        bin_ = 0
        sr = self.range << 7
        if self.value >= sr:
            self.value -= sr
            bin_ = 1
        return bin_

    def decode_bins_ep(self, num_bins: int) -> int:
        if self.range == 256:
            return self._decode_aligned_bins_ep(num_bins)
        rem = num_bins
        bins = 0
        while rem > 8:
            self.value = (self.value << 8) + \
                (self._read_byte() << (8 + self.bits_needed))
            sr = self.range << 15
            for _ in range(8):
                bins += bins
                sr >>= 1
                if self.value >= sr:
                    bins += 1
                    self.value -= sr
            rem -= 8
        self.bits_needed += rem
        self.value <<= rem
        if self.bits_needed >= 0:
            self.value += self._read_byte() << self.bits_needed
            self.bits_needed -= 8
        sr = self.range << (rem + 7)
        for _ in range(rem):
            bins += bins
            sr >>= 1
            if self.value >= sr:
                bins += 1
                self.value -= sr
        return bins

    def _decode_aligned_bins_ep(self, num_bins: int) -> int:
        rem = num_bins
        bins = 0
        while rem > 0:
            n = min(rem, 8)
            mask = (1 << n) - 1
            new_bins = (self.value >> (15 - n)) & mask
            bins = (bins << n) | new_bins
            self.value = (self.value << n) & 0x7FFF
            rem -= n
            self.bits_needed += n
            if self.bits_needed >= 0:
                self.value |= self._read_byte() << self.bits_needed
                self.bits_needed -= 8
        return bins

    def decode_bin_trm(self) -> int:
        self.range -= 2
        sr = self.range << 7
        if self.value >= sr:
            return 1
        if self.range < 256:
            self.range += self.range
            self.value += self.value
            self.bits_needed += 1
            if self.bits_needed == 0:
                self.value += self._read_byte()
                self.bits_needed = -8
        return 0
