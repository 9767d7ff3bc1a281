"""Native C CABAC engine: bit-equality with the Python engine.

The native engine (native/cabac_engine.c) executes recorded bin-op
streams; it must be byte-identical to codec/cabac.py (which is itself
bit-exact against VTM BinEncoder.cpp:100-340) — payload bytes, tail
bits, and final context states.
"""

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import cabac
from fastintercu_vvc_tpu import native


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no C compiler")


def _random_bank(rng, n_ctx):
    b = cabac.ContextBank(n_ctx)
    for i in range(n_ctx):
        b.init_ctx(i, 32, int(rng.randint(0, 64)), int(rng.randint(0, 16)))
    return b


def test_randomized_streams_bit_identical():
    rng = np.random.RandomState(7)
    for trial in range(8):
        n_ctx = 379
        eb = _random_bank(np.random.RandomState(trial), n_ctx)
        nb = _random_bank(np.random.RandomState(trial), n_ctx)
        enc = cabac.CabacEncoder(eb)
        rec = native.OpRecorder()
        for _ in range(2000):
            k = rng.randint(4)
            if k == 0:
                b, c = int(rng.randint(2)), int(rng.randint(n_ctx))
                enc.encode_bin(b, c)
                rec.encode_bin(b, c)
            elif k == 1:
                b = int(rng.randint(2))
                enc.encode_bin_ep(b)
                rec.encode_bin_ep(b)
            elif k == 2:
                n = int(rng.randint(1, 31))
                v = int(rng.randint(0, 2 ** min(n, 30)))
                enc.encode_bins_ep(v, n)
                rec.encode_bins_ep(v, n)
            else:
                enc.encode_bin_trm(0)
                rec.encode_bin_trm(0)
        enc.encode_bin_trm(1)
        rec.encode_bin_trm(1)
        nat_payload, nat_tail = native.cabac_run(rec.to_array(), nb)
        assert enc.finish() == nat_payload
        assert enc.tail_bits() == nat_tail
        assert np.array_equal(eb.state0, nb.state0)
        assert np.array_equal(eb.state1, nb.state1)


def test_decisions_commit_uses_native_and_matches_python():
    """A decisions-driven frame encode (native commit pass) must emit
    the identical bitstream to the pure-Python engine."""
    from fastintercu_vvc_tpu.codec import hls, encoder, batch_search

    rng = np.random.RandomState(3)
    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W]
    org = ((yy * 9 + xx * 5) % 1024).astype(np.int32)
    org[16:48, 16:48] = rng.randint(0, 1024, (32, 32))

    cfg = hls.SeqConfig(width=W, height=H, qp=32, chroma_format=0,
                        deblocking=False, ctu_size=64)
    dec = batch_search.search_intra_frame(org, cfg, qp=32)

    fe = encoder.FrameEncoder(cfg)
    r_native = fe.encode_frame(org, decisions=dec)

    # force the python engine for the same decisions
    lib_save = native._lib
    try:
        native._lib = None
        orig = native.get_lib
        native.get_lib = lambda: None
        r_py = fe.encode_frame(org, decisions=dec)
    finally:
        native.get_lib = orig
        native._lib = lib_save

    assert r_native.bitstream == r_py.bitstream
    assert np.array_equal(r_native.recon, r_py.recon)
