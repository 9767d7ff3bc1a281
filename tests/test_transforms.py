"""Transform + quant kernel tests (integer exactness, round-trip)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastintercu_vvc_tpu.ops import rom, transforms, quant


def test_rom_known_values():
    d4 = rom.trans_matrix("DCT2", 4)
    np.testing.assert_array_equal(
        d4, [[64, 64, 64, 64], [83, 36, -36, -83],
             [64, -64, -64, 64], [36, -83, 83, -36]])
    d8 = rom.trans_matrix("DST7", 4)
    np.testing.assert_array_equal(d8[0], [29, 55, 74, 84])
    dct8 = rom.trans_matrix("DCT8", 4)
    np.testing.assert_array_equal(dct8[1], [74, 0, -74, -74])


def test_rom_dct2_orthogonality():
    for n in (4, 8, 16, 32, 64):
        T = rom.trans_matrix("DCT2", n).astype(np.float64)
        G = T @ T.T
        diag = np.diag(G)
        off = G - np.diag(diag)
        # off-diagonal energy is tiny relative to row norms (6-bit quantized)
        assert np.abs(off).max() / diag.min() < 0.06, n


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32),
                                   (8, 4), (4, 16), (32, 8)])
def test_dct2_roundtrip(shape):
    """Round-trip error is bounded by the 6-bit matrix quantization noise
    (VTM's integer transforms have the same inherent error)."""
    h, w = shape
    rng = np.random.RandomState(42)
    resi = jnp.asarray(rng.randint(-512, 512, size=(5, h, w)), jnp.int32)
    c = transforms.fwd_transform_2d(resi, bit_depth=10)
    r = transforms.inv_transform_2d(c, bit_depth=10)
    err = np.abs(np.asarray(r) - np.asarray(resi))
    assert err.max() <= 8, (shape, err.max())


def test_dct2_roundtrip_64_smooth():
    """64-point DCT2 zero-out keeps only 32 low frequencies, so round-trip
    is only meaningful for smooth content."""
    y, x = np.mgrid[0:64, 0:64]
    resi = jnp.asarray(
        (200 * np.sin(x / 12.0) * np.cos(y / 9.0)).astype(np.int32))[None]
    c = transforms.fwd_transform_2d(resi, bit_depth=10)
    r = transforms.inv_transform_2d(c, bit_depth=10)
    err = np.abs(np.asarray(r) - np.asarray(resi))
    assert err.max() <= 8, err.max()


@pytest.mark.parametrize("kinds", [(transforms.DST7, transforms.DST7),
                                   (transforms.DCT8, transforms.DST7),
                                   (transforms.DCT8, transforms.DCT8)])
@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (8, 16)])
def test_mts_roundtrip(kinds, shape):
    kh, kv = kinds
    h, w = shape
    rng = np.random.RandomState(1)
    resi = jnp.asarray(rng.randint(-256, 256, size=(3, h, w)), jnp.int32)
    c = transforms.fwd_transform_2d(resi, kind_h=kh, kind_v=kv)
    r = transforms.inv_transform_2d(c, kind_h=kh, kind_v=kv)
    err = np.abs(np.asarray(r) - np.asarray(resi))
    assert err.max() <= 8, (kinds, shape, err.max())


def test_zero_out_high_freq():
    resi = jnp.ones((1, 64, 64), jnp.int32) * 100
    c = np.asarray(transforms.fwd_transform_2d(resi))
    assert np.all(c[:, 32:, :] == 0) and np.all(c[:, :, 32:] == 0)
    resi = jnp.ones((1, 32, 32), jnp.int32) * 100
    c = np.asarray(transforms.fwd_transform_2d(
        resi, kind_h=transforms.DST7, kind_v=transforms.DST7))
    assert np.all(c[:, 16:, :] == 0) and np.all(c[:, :, 16:] == 0)


def test_fwd_transform_dc_value():
    """Flat block: DC coefficient should carry the whole energy.

    For an NxN flat block of value v at bit depth 10:
    stage1 -> each row DC = rnd(v*N*64 >> s1); stage2 similar.
    Cross-check with direct integer evaluation of the matmul pipeline.
    """
    v = 100
    resi = jnp.full((1, 8, 8), v, jnp.int32)
    c = np.asarray(transforms.fwd_transform_2d(resi, bit_depth=10))
    T = rom.trans_matrix("DCT2", 8).astype(np.int64)
    s1, s2 = 3 + 10 + 6 - 15, 3 + 6
    a = (np.full((8, 8), v, np.int64) @ T.T + (1 << (s1 - 1))) >> s1
    ref = (T @ a + (1 << (s2 - 1))) >> s2
    np.testing.assert_array_equal(c[0], ref)
    assert np.count_nonzero(c) == 1  # only DC


@pytest.mark.parametrize("qp", [22, 27, 32, 37, 42, 51])
def test_quant_dequant_roundtrip(qp):
    rng = np.random.RandomState(7)
    coeff = jnp.asarray(rng.randint(-2000, 2000, size=(4, 16, 16)), jnp.int32)
    q = quant.quant(coeff, qp)
    dq = quant.dequant(q, qp)
    # effective step = 2^iQBits / quantScale for this geometry
    per, rem = qp // 6, qp % 6
    tshift = quant.transform_shift(10, 4, 4)
    step = 2.0 ** (quant.QUANT_SHIFT + per + tshift) / \
        np.asarray(rom.quant_scales())[0][rem]
    err = np.abs(np.asarray(dq) - np.asarray(coeff))
    # deadzone error < (1 - 85/512) * step, plus dequant rounding
    assert err.max() <= step + 2, (qp, err.max(), step)
    # quantized levels reconstruct near the coefficient
    assert np.all(np.sign(np.asarray(dq)[np.asarray(q) != 0])
                  == np.sign(np.asarray(coeff)[np.asarray(q) != 0]))


def test_quant_deadzone_asymmetry():
    """Non-IRAP deadzone (85/512 ~ 1/6 rounding offset): small coeffs
    quantize to zero; IRAP offset (171/512 ~ 1/3) is larger."""
    coeff = jnp.full((1, 8, 8), 40, jnp.int32)
    q_inter = quant.quant(coeff, 32, is_irap=False)
    q_irap = quant.quant(coeff, 32, is_irap=True)
    assert np.asarray(q_irap).sum() >= np.asarray(q_inter).sum()


def test_1d_transform_roundtrip():
    """VTM's 1-D fwd+inv pair carries an inherent exact gain of 2
    (4096*N / 2^(log2N+1+10) = 2), compensated in quant's transform
    shift; round-trip therefore reconstructs 2x the input."""
    rng = np.random.RandomState(3)
    resi = jnp.asarray(rng.randint(-512, 512, size=(2, 1, 16)), jnp.int32)
    c = transforms.fwd_transform_1xN(resi, axis=-1)
    r = transforms.inv_transform_1xN(c, axis=-1)
    assert np.abs(np.asarray(r) - 2 * np.asarray(resi)).max() <= 8


def test_sign_hiding_parity_fixer():
    """apply_sign_hiding: every qualifying coding group ends with the
    first nonzero's sign matching the level-sum parity."""
    import numpy as np
    from fastintercu_vvc_tpu.codec import residual
    rng = np.random.RandomState(3)
    for _ in range(50):
        q = rng.randint(-6, 7, (16, 16)).astype(np.int64)
        q[rng.rand(16, 16) < 0.5] = 0
        out = residual.apply_sign_hiding(q)
        cctx = residual.CoeffCtx(16, 16, residual.LUMA)
        g = 1 << cctx.log2_cg_size
        for sub in range(0, len(cctx.scan), g):
            grp = cctx.scan[sub:sub + g]
            vals = [int(out[y, x]) for (x, y) in grp]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz or nz[-1] - nz[0] < 4:
                continue
            sign_bit = 0 if vals[nz[0]] > 0 else 1
            assert sign_bit == (sum(vals[nz[0]:nz[-1] + 1]) & 1)
