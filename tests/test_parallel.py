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


def _content(w, h, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    org = (400 + 300 * np.sin(xx / 15.0) * np.sin(yy / 11.0)
           + rng.randint(-15, 15, (h, w)))
    org[:, w // 3:w // 3 + 3] = 950
    org[h // 3:h // 3 + 2, :] = 80
    return np.clip(org, 0, 1023).astype(np.int32)


def test_sharded_fused_search_bitstream_equality(mesh8):
    """The whole point of the tile sharding: a fused-search encode
    whose device legs ran sharded over 8 CTU-column tiles must emit
    the BYTE-IDENTICAL bitstream of the single-device encode
    (VERDICT r2 #6). Covers intra and inter (P frame with sharded
    SAD map) legs."""
    from fastintercu_vvc_tpu.codec import encoder, fused_search, hls
    w, h = 512, 64                     # 8 tiles x 64-wide CTU columns
    cfg = hls.SeqConfig(width=w, height=h,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=8, min_qt_inter=8, qp=32,
                        max_mtt_depth_intra=2, max_mtt_depth_inter=2,
                        max_bt_intra=64, max_bt_inter=64)
    org0 = _content(w, h)
    org1 = np.clip(np.roll(org0, 3, axis=1)
                   + np.random.RandomState(9).randint(-6, 6, (h, w)),
                   0, 1023).astype(np.int32)

    streams = []
    for mesh in (None, mesh8):
        fe = encoder.FrameEncoder(cfg)
        d0 = fused_search.search_frame(org0, cfg, qp=32, mesh=mesh)
        r0 = fe.encode_frame(org0, poc=0, qp=32, decisions=d0)
        d1 = fused_search.search_frame(
            org1, cfg, qp=32, slice_type=hls.P_SLICE,
            ref_planes=[(0, 0, r0.recon)], mesh=mesh)
        r1 = fe.encode_frame(org1, poc=1, qp=32,
                             slice_type=hls.P_SLICE,
                             refs=[(0, r0)], decisions=d1)
        streams.append((r0.bitstream, r1.bitstream))
    assert streams[0][0] == streams[1][0]      # intra frame bytes
    assert streams[0][1] == streams[1][1]      # inter frame bytes
