"""Bit-estimator (codec/bitest) vs the real CABAC engine.

The estimator is the RDO rate model (VTM BinEncoder.h BitEstimator
parity): it must track the arithmetic engine's actual output length
closely on realistic bin streams, and its vectorized helpers must match
the BitCounter run of the same syntax writers.
"""

import numpy as np

from fastintercu_vvc_tpu.codec import bitest, cabac, contexts, encoder, \
    partition


def _rand_bins(rng, n, num_ctx):
    ctx_id = rng.randint(0, num_ctx, n)
    # skewed bins: mostly follow a per-ctx bias so contexts adapt
    bias = rng.rand(num_ctx)
    bins = (rng.rand(n) < bias[ctx_id]).astype(int)
    return ctx_id, bins


def test_counter_tracks_engine():
    rng = np.random.RandomState(7)
    for trial in range(3):
        bank = contexts.init_bank(contexts.B_SLICE, 32)
        enc = cabac.CabacEncoder(bank.copy())
        cnt = bitest.BitCounter(bank.copy())
        ctx_id, bins = _rand_bins(rng, 4000, contexts.num_ctx())
        eps = rng.randint(0, 2, 1000)
        for c, b in zip(ctx_id, bins):
            enc.encode_bin(int(b), int(c))
            cnt.encode_bin(int(b), int(c))
        for b in eps:
            enc.encode_bin_ep(int(b))
            cnt.encode_bin_ep(int(b))
        enc.encode_bin_trm(1)
        real_bits = len(enc.finish()) * 8 + enc.tail_bits()[1]
        est = cnt.bits()
        assert abs(est - real_bits) / real_bits < 0.02, \
            (est, real_bits)


def test_counter_context_adaptation_matches_engine():
    bank = contexts.init_bank(contexts.I_SLICE, 27)
    enc = cabac.CabacEncoder(bank.copy())
    cnt = bitest.BitCounter(bank.copy())
    rng = np.random.RandomState(3)
    ctx_id, bins = _rand_bins(rng, 500, contexts.num_ctx())
    for c, b in zip(ctx_id, bins):
        enc.encode_bin(int(b), int(c))
        cnt.encode_bin(int(b), int(c))
    assert np.array_equal(enc.ctx.state0, cnt.ctx.state0)
    assert np.array_equal(enc.ctx.state1, cnt.ctx.state1)


def test_mvd_bits_vectorized_matches_counter():
    bank = contexts.init_bank(contexts.B_SLICE, 32)
    fb = bitest.bank_frac(bank)
    rng = np.random.RandomState(11)
    mvx = rng.randint(-40, 41, 64)
    mvy = rng.randint(-40, 41, 64)
    vec = bitest.mvd_bits(mvx, mvy, fb)
    for i in range(64):
        bc = bitest.BitCounter(bank.copy(), update=False)
        encoder.write_mvd(bc, (int(mvx[i]), int(mvy[i])))
        assert abs(vec[i] - bc.bits()) < 1e-6, \
            (mvx[i], mvy[i], vec[i], bc.bits())


def test_split_rate_table():
    bank = contexts.init_bank(contexts.B_SLICE, 32)
    pc = partition.PartitionConstraints(
        ctu_size=128, min_cu=4, min_qt=8, max_mtt_depth=3,
        max_bt_size=128, max_tt_size=64)
    sr = bitest.SplitRate(bank, pc)
    c = sr.costs(64, 64, 1, 0)
    # every legal split present with a sane positive bit cost
    assert partition.NO_SPLIT in c and partition.QT_SPLIT in c
    assert partition.BT_H in c and partition.BT_V in c
    for v in c.values():
        assert 0.0 < v < 16.0
    # no-split must be cheaper than any split (first bin 0 vs 1 + more)
    assert c[partition.NO_SPLIT] < min(v for k, v in c.items()
                                       if k != partition.NO_SPLIT)
    # cache returns identical dict
    assert sr.costs(64, 64, 1, 0) is c
