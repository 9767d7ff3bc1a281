"""CABAC engine round-trip tests: decode(encode(bins)) == bins under many
randomized op sequences, matching start/termination protocol."""

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import cabac
from fastintercu_vvc_tpu.utils import bitstream


def _finish_to_bytes(enc: cabac.CabacEncoder) -> bytes:
    payload = enc.finish()
    w = bitstream.BitWriter()
    w.append_bytes(payload)
    val, nbits = enc.tail_bits()
    w.write(val, nbits)
    # spec: after termination the slice ends with rbsp trailing; for the
    # raw engine round-trip we just pad with the stop bit pattern
    w.write(1, 1)
    w.align_zero()
    return w.get_bytes()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ctx_bin_roundtrip(seed):
    rng = np.random.RandomState(seed)
    n_ctx = 8
    n_bins = 500
    bins = rng.randint(0, 2, n_bins)
    ctx_ids = rng.randint(0, n_ctx, n_bins)
    init_ids = rng.randint(0, 64, n_ctx)

    enc_bank = cabac.ContextBank(n_ctx)
    dec_bank = cabac.ContextBank(n_ctx)
    for i in range(n_ctx):
        enc_bank.init_ctx(i, qp=32, init_id=int(init_ids[i]))
        dec_bank.init_ctx(i, qp=32, init_id=int(init_ids[i]))

    enc = cabac.CabacEncoder(enc_bank)
    for b, c in zip(bins, ctx_ids):
        enc.encode_bin(int(b), int(c))
    enc.encode_bin_trm(1)
    data = _finish_to_bytes(enc)

    dec = cabac.CabacDecoder(data, dec_bank)
    out = [dec.decode_bin(int(c)) for c in ctx_ids]
    assert out == list(bins)
    assert dec.decode_bin_trm() == 1
    # context states must evolve identically on both sides
    np.testing.assert_array_equal(enc_bank.state0, dec_bank.state0)
    np.testing.assert_array_equal(enc_bank.state1, dec_bank.state1)


@pytest.mark.parametrize("seed", [0, 7])
def test_mixed_ops_roundtrip(seed):
    rng = np.random.RandomState(seed)
    n_ctx = 4
    ops = []
    for _ in range(800):
        kind = rng.randint(0, 3)
        if kind == 0:
            ops.append(("ctx", int(rng.randint(0, 2)),
                        int(rng.randint(0, n_ctx))))
        elif kind == 1:
            ops.append(("ep", int(rng.randint(0, 2))))
        else:
            n = int(rng.randint(1, 17))
            ops.append(("eps", int(rng.randint(0, 1 << n)), n))

    enc_bank = cabac.ContextBank(n_ctx)
    dec_bank = cabac.ContextBank(n_ctx)
    for i in range(n_ctx):
        enc_bank.init_ctx(i, 27, 21 + i * 8)
        dec_bank.init_ctx(i, 27, 21 + i * 8)

    enc = cabac.CabacEncoder(enc_bank)
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[1], op[2])
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
        else:
            enc.encode_bins_ep(op[1], op[2])
    enc.encode_bin_trm(1)
    data = _finish_to_bytes(enc)

    dec = cabac.CabacDecoder(data, dec_bank)
    for op in ops:
        if op[0] == "ctx":
            assert dec.decode_bin(op[2]) == op[1]
        elif op[0] == "ep":
            assert dec.decode_bin_ep() == op[1]
        else:
            assert dec.decode_bins_ep(op[2]) == op[1]
    assert dec.decode_bin_trm() == 1


def test_trm_zero_then_more_bins():
    """end_of_slice trm bin == 0 continues normally."""
    bank_e = cabac.ContextBank(1)
    bank_d = cabac.ContextBank(1)
    for b in (bank_e, bank_d):
        b.init_ctx(0, 32, 32)
    enc = cabac.CabacEncoder(bank_e)
    seq = [1, 0, 1, 1, 0]
    for b in seq:
        enc.encode_bin(b, 0)
        enc.encode_bin_trm(0)
    enc.encode_bin_trm(1)
    data = _finish_to_bytes(enc)
    dec = cabac.CabacDecoder(data, bank_d)
    for b in seq:
        assert dec.decode_bin(0) == b
        assert dec.decode_bin_trm() == 0
    assert dec.decode_bin_trm() == 1


def test_bitwriter_uvlc_svlc():
    w = bitstream.BitWriter()
    for v in (0, 1, 2, 5, 100, 255):
        w.write_uvlc(v)
    for v in (0, 1, -1, 7, -9, 200):
        w.write_svlc(v)
    w.write_byte_alignment()
    r = bitstream.BitReader(w.get_bytes())
    assert [r.read_uvlc() for _ in range(6)] == [0, 1, 2, 5, 100, 255]
    assert [r.read_svlc() for _ in range(6)] == [0, 1, -1, 7, -9, 200]


def test_emulation_prevention():
    rbsp = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03abc"
    ebsp = bitstream.add_emulation_prevention(rbsp)
    assert b"\x00\x00\x00" not in ebsp
    assert b"\x00\x00\x01" not in ebsp
    assert b"\x00\x00\x02" not in ebsp
    assert bitstream.strip_emulation_prevention(ebsp) == rbsp


def test_probability_adaptation_compresses():
    """A skewed source must compress well below 1 bit/bin."""
    rng = np.random.RandomState(0)
    bins = (rng.rand(4000) < 0.05).astype(int)
    bank = cabac.ContextBank(1)
    bank.init_ctx(0, 32, 32)
    enc = cabac.CabacEncoder(bank)
    for b in bins:
        enc.encode_bin(int(b), 0)
    enc.encode_bin_trm(1)
    data = _finish_to_bytes(enc)
    assert len(data) * 8 < 0.5 * len(bins)
