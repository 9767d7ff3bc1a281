"""Bit-exactness of the native commit kernel (native/commit_kernel.c)
against its Python twins (ops/intra.py, ops/transforms_np.py)."""

import numpy as np
import pytest

from fastintercu_vvc_tpu import native
from fastintercu_vvc_tpu.ops import intra, transforms_np as tnp

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")

BD = 10
RNG = np.random.RandomState(7)


def _rand_refs(w, h, mrl=0):
    top = RNG.randint(0, 1 << BD, 2 * w + 1 + mrl).astype(np.int32)
    left = RNG.randint(0, 1 << BD, 2 * h + 1 + mrl).astype(np.int32)
    left[0] = top[0]
    return top, left


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 32),
                                 (64, 64), (4, 16), (32, 8), (8, 64),
                                 (64, 16), (4, 32)])
def test_predict_all_modes(w, h):
    import ctypes
    lib = native._ck()
    top, left = _rand_refs(w, h)
    for mode in range(67):
        want = intra.predict(mode, top, left, w, h, BD)
        got = np.empty((h, w), np.int32)
        lib.ck_predict(mode, native._i32p(top), native._i32p(left),
                       w, h, BD, 0, 0, native._i32p(got))
        assert np.array_equal(want, got), f"mode {mode} {w}x{h}"


@pytest.mark.parametrize("w,h", [(8, 8), (16, 4), (4, 8), (32, 16)])
@pytest.mark.parametrize("mrl", [1, 2])
def test_predict_mrl(w, h, mrl):
    lib = native._ck()
    top, left = _rand_refs(w, h, mrl)
    for mode in [1, 2, 18, 34, 50, 66, 10, 45]:
        want = intra.predict(mode, top, left, w, h, BD, mrl=mrl)
        got = np.empty((h, w), np.int32)
        lib.ck_predict(mode, native._i32p(top), native._i32p(left),
                       w, h, BD, mrl, 0, native._i32p(got))
        assert np.array_equal(want, got), f"mode {mode} mrl {mrl}"


@pytest.mark.parametrize("w,h", [(4, 4), (8, 16), (32, 32), (64, 64),
                                 (16, 8), (32, 4)])
@pytest.mark.parametrize("kinds", [(0, 0), (2, 2), (1, 2), (2, 1), (1, 1)])
def test_transforms(w, h, kinds):
    if max(w, h) > 32 and kinds != (0, 0):
        pytest.skip("MTS kinds only up to 32")
    lib = native._ck()
    kh, kv = kinds
    resi = RNG.randint(-512, 512, (h, w)).astype(np.int32)
    want = tnp.fwd_transform_2d(resi, kind_h=kh, kind_v=kv, bit_depth=BD)
    got = np.empty((h, w), np.int32)
    lib.ck_fwd_xform(native._i32p(resi), w, h, kh, kv, BD,
                     native._i32p(got))
    assert np.array_equal(want, got)
    wanti = tnp.inv_transform_2d(want, kind_h=kh, kind_v=kv, bit_depth=BD)
    goti = np.empty((h, w), np.int32)
    lib.ck_inv_xform(native._i32p(got), w, h, kh, kv, BD,
                     native._i32p(goti))
    assert np.array_equal(wanti, goti)


def _py_eval(org, recon, coded, x, y, w, h, mode, qp_eff, irap,
             mrl=0, xmax=None):
    top, left = intra.build_refs_grid(recon, x, y, w, h, BD, coded,
                                      mrl=mrl, xmax=xmax)
    pred = intra.predict(mode, top, left, w, h, BD, mrl=mrl)
    blk = org[y:y + h, x:x + w]
    coeff = tnp.fwd_transform_2d(blk - pred, bit_depth=BD)
    q = tnp.quant(coeff, qp_eff, bit_depth=BD, is_irap=irap)
    if np.any(q):
        dq = tnp.dequant(q, qp_eff, bit_depth=BD)
        r = tnp.inv_transform_2d(dq, bit_depth=BD)
        rec = np.clip(pred + r, 0, (1 << BD) - 1)
        return q, rec, True
    return q, np.clip(pred, 0, (1 << BD) - 1), False


@pytest.mark.parametrize("qp_eff", [20, 34, 44])
def test_eval_intra_vs_python(qp_eff):
    W = H = 64
    org = RNG.randint(0, 1 << BD, (H, W)).astype(np.int32)
    recon = RNG.randint(0, 1 << BD, (H, W)).astype(np.int32)
    coded = np.zeros((H // 4, W // 4), bool)
    coded[:4, :] = True           # top 16 rows coded
    coded[:, :2] = True           # left 8 cols coded
    for (x, y, w, h) in [(8, 16, 16, 16), (8, 16, 8, 32), (0, 0, 16, 8),
                         (24, 16, 32, 32), (8, 16, 4, 4)]:
        for mode in [0, 1, 18, 33, 50, 66, 7]:
            qw, rw, cbfw = _py_eval(org, recon, coded, x, y, w, h, mode,
                                    qp_eff, True)
            q, rec, cbf, mts, ts, ssd = native.eval_intra(
                org, recon, coded, x, y, w, h, mode, qp_eff, BD,
                lam=100.0, is_irap=True)
            assert cbf == cbfw and mts == 0 and not ts
            assert np.array_equal(q, qw), (x, y, w, h, mode)
            assert np.array_equal(rec, rw)
            want_ssd = float(((org[y:y + h, x:x + w] - rw)
                              .astype(np.int64) ** 2).sum())
            assert ssd == want_ssd


def test_mode_sads_matches_predict():
    W = H = 32
    org = RNG.randint(0, 1 << BD, (H, W)).astype(np.int32)
    recon = RNG.randint(0, 1 << BD, (H, W)).astype(np.int32)
    coded = np.ones((H // 4, W // 4), bool)
    coded[2:, 2:] = False
    x, y, w, h = 8, 8, 8, 8
    modes = list(range(0, 67, 5))
    preds, sads = native.mode_sads(org, recon, coded, x, y, w, h, BD,
                                   modes)
    top, left = intra.build_refs_grid(recon, x, y, w, h, BD, coded)
    blk = org[y:y + h, x:x + w]
    for i, m in enumerate(modes):
        p = intra.predict(m, top, left, w, h, BD)
        assert np.array_equal(preds[i], p), m
        assert sads[i] == int(np.abs(blk - p).sum())


def test_native_chroma_kernel_bitstream_identity():
    """ck_eval_chroma / ck_pair_eval == the Python chroma path:
    identical bitstream over a small GOP with CCLM + joint-CbCr +
    LMCS + SDH active."""
    import numpy as np
    from fastintercu_vvc_tpu.codec import gop, hls
    from fastintercu_vvc_tpu import native as nat
    if nat._ck() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    W, H = 128, 64
    yy, xx = np.mgrid[0:H, 0:W]
    y0 = np.clip(380 + 260 * np.sin(xx / 11.0) * np.cos(yy / 8.0)
                 + rng.randint(-20, 20, (H, W)), 0, 1023).astype(np.int32)
    frames = []
    for t in range(2):
        y = np.roll(y0, 2 * t, axis=1)
        u = np.clip(512 + (y[::2, ::2] - 512) // 3, 0, 1023)
        v = np.clip(512 - (y[::2, ::2] - 512) // 4, 0, 1023)
        frames.append((y, u, v))
    cfg = hls.SeqConfig(width=W, height=H, chroma_format=hls.CHROMA_420,
                        ctu_size=64, log2_min_cu=3,
                        sign_data_hiding=True, mts_intra=True,
                        cclm=True, joint_cbcr=True, lmcs=True,
                        deblocking=True, sao=False, alf=False)
    r1 = gop.SequenceEncoder(cfg, num_refs=1).encode(frames, qp=30)
    orig = nat._ck
    nat._ck = lambda: None
    try:
        r2 = gop.SequenceEncoder(cfg, num_refs=1).encode(frames, qp=30)
    finally:
        nat._ck = orig
    assert r1.bitstream == r2.bitstream
