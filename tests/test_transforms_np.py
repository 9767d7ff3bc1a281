"""NumPy twin must match the JAX kernels bit-exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastintercu_vvc_tpu.ops import quant, transforms, transforms_np


@pytest.mark.parametrize("shape", [(4, 4), (8, 16), (32, 32), (64, 64)])
@pytest.mark.parametrize("qp", [26, 44])
def test_np_twin_matches_jax(shape, qp):
    h, w = shape
    rng = np.random.RandomState(1)
    resi = rng.randint(-700, 700, (3, h, w)).astype(np.int32)
    c_np = transforms_np.fwd_transform_2d(resi)
    c_jx = np.asarray(transforms.fwd_transform_2d(jnp.asarray(resi)))
    np.testing.assert_array_equal(c_np, c_jx)
    q_np = transforms_np.quant(c_np, qp, is_irap=True)
    q_jx = np.asarray(quant.quant(jnp.asarray(c_jx), qp, is_irap=True))
    np.testing.assert_array_equal(q_np, q_jx)
    d_np = transforms_np.dequant(q_np, qp)
    d_jx = np.asarray(quant.dequant(jnp.asarray(q_jx), qp))
    np.testing.assert_array_equal(d_np, d_jx)
    r_np = transforms_np.inv_transform_2d(d_np)
    r_jx = np.asarray(transforms.inv_transform_2d(jnp.asarray(d_jx)))
    np.testing.assert_array_equal(r_np, r_jx)
