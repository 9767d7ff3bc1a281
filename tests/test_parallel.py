"""Mesh/tile-sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import batch_search
from fastintercu_vvc_tpu.parallel import make_mesh, sharded_level_cost


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(n_tile=8)


@pytest.mark.parametrize("s", [8, 16, 32, 64])
def test_sharded_level_cost_matches_single_device(mesh8, s):
    rng = np.random.RandomState(1)
    H, W = 128, 1024
    frame = rng.randint(0, 1024, (H, W)).astype(np.int32)
    mode_sh, cost_sh = sharded_level_cost(jnp.asarray(frame), s, mesh8)
    tops, lefts = batch_search._block_refs_from_plane(frame, s)
    blocks = batch_search._blocks(frame, s)
    mode_1, cost_1 = batch_search._level_cost(
        jnp.asarray(tops), jnp.asarray(lefts), jnp.asarray(blocks), s)
    nbx = W // s
    np.testing.assert_array_equal(np.asarray(mode_sh),
                                  np.asarray(mode_1).reshape(-1, nbx))
    np.testing.assert_array_equal(np.asarray(cost_sh),
                                  np.asarray(cost_1).reshape(-1, nbx))


def test_narrow_tiles_rejected(mesh8):
    frame = jnp.zeros((64, 512), jnp.int32)    # tiles of 64 < 2*64
    with pytest.raises(AssertionError):
        sharded_level_cost(frame, 64, mesh8)


def test_dryrun_multichip_covers_tiles():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
