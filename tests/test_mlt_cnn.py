"""Tests for the MLT-CNN model family + training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastintercu_vvc_tpu.models import mlt_cnn, losses, train


def test_ctu_model_shapes():
    model = mlt_cnn.GapBigMltCtu()
    variables = mlt_cnn.init_params(model, jax.random.PRNGKey(0), batch=2)
    x = jnp.zeros((2, 128, 128, 2))
    l1, l2, l3 = model.apply(variables, x, jnp.zeros((2,)), jnp.zeros((2,)))
    assert l1.shape == (2, 2)
    assert l2.shape == (2, 3)
    assert l3.shape == (2, 4)


def test_cu_model_4_heads():
    model = mlt_cnn.GapBigMltCu()
    variables = mlt_cnn.init_params(model, jax.random.PRNGKey(0), batch=1,
                                    size=64)
    x = jnp.zeros((1, 64, 64, 2))
    outs = model.apply(variables, x, jnp.zeros((1,)), jnp.zeros((1,)))
    assert [o.shape[-1] for o in outs] == [2, 3, 4, 6]


def test_param_count_matches_reference_topology():
    """GapBig CTU net: stem 2->32 conv3x3, stages [2,2,2,2] of widths
    (32,64,128,256) BasicBlocks, heads Linear(64+2,2)/(128+2,3)/(256+2,4).
    Count computed analytically from the reference topology
    (mlt_ctu_or_pq_arch.py:239-299)."""
    def conv(cin, cout, k):
        return cin * cout * k * k

    def bn(c):
        return 2 * c  # scale+bias (running stats are not params)

    def basic(cin, cout, stride):
        n = conv(cin, cout, 3) + bn(cout) + conv(cout, cout, 3) + bn(cout)
        if stride != 1 or cin != cout:
            n += conv(cin, cout, 1) + bn(cout)
        return n

    expected = conv(2, 32, 3)
    widths = [32, 64, 128, 256]
    cin = 32
    for w in widths:
        expected += basic(cin, w, 2) + basic(w, w, 1)
        cin = w
    expected += (64 + 2 + 1) * 2 + (128 + 2 + 1) * 3 + (256 + 2 + 1) * 4

    model = mlt_cnn.GapBigMltCtu()
    variables = mlt_cnn.init_params(model, jax.random.PRNGKey(0))
    actual = sum(np.prod(p.shape)
                 for p in jax.tree_util.tree_leaves(variables["params"]))
    assert actual == expected


def test_make_ctu_features():
    org = jnp.full((3, 128, 128), 512, jnp.int32)
    pred = jnp.full((3, 128, 128), 500, jnp.int32)
    feat = mlt_cnn.make_ctu_features(org, pred)
    assert feat.shape == (3, 128, 128, 2)
    np.testing.assert_allclose(feat[0, 0, 0, 0], 512 / 1023, rtol=1e-6)
    np.testing.assert_allclose(feat[0, 0, 0, 1], 12 / 1023, rtol=1e-5)


def test_staged_loss_weights():
    w = losses.staged_ce_weights(jnp.int32(100))
    np.testing.assert_allclose(np.asarray(w), [0.97, 0.02, 0.01])
    w = losses.staged_ce_weights(jnp.int32(200_000))
    np.testing.assert_allclose(np.asarray(w), [0.1, 0.7, 0.2])
    w = losses.staged_ce_weights(jnp.int32(400_000))
    np.testing.assert_allclose(np.asarray(w), [0.1, 0.1, 0.8])
    w = losses.staged_ce_weights(jnp.int32(500_000))
    np.testing.assert_allclose(np.asarray(w), [0.0, 0.0, 1.0])


def test_cosine_restart_schedule():
    sched = train.cosine_restart_schedule()
    assert np.isclose(float(sched(0)), 4e-4, rtol=1e-3)
    # After the first restart boundary the LR peaks at half the base.
    assert np.isclose(float(sched(50_000)), 2e-4, rtol=1e-3)


def test_train_step_decreases_loss():
    model = mlt_cnn.MltCnnL3(num_blocks=(1, 1, 1, 1), widths=(4, 4, 4, 4))
    tx = train.make_adam(1e-2)
    state = train.create_train_state(model, jax.random.PRNGKey(0), tx)
    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rng.rand(8, 32, 32, 2), jnp.float32),
        "poc": jnp.zeros((8,)),
        "qp": jnp.full((8,), 32.0),
        "labels": (jnp.zeros((8,), jnp.int32),
                   jnp.zeros((8,), jnp.int32),
                   jnp.zeros((8,), jnp.int32)),
    }
    step = jax.jit(train.make_train_step(model, tx))
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 11


def test_dp_train_step_8_devices():
    from jax.sharding import Mesh
    assert len(jax.devices()) >= 8
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    outs = jax.jit(fn)(*args)
    assert outs[2].shape == (8, 4)


def test_ablation_archs():
    """Baseline/ablation family (reference resnet_arch.py etc.):
    single-head ResNet and the no-PQ MLT variant forward with the
    right shapes; the PQ ablation actually changes the head params."""
    x1 = jnp.zeros((2, 32, 32, 1))
    x2 = jnp.zeros((2, 32, 32, 2))
    poc = jnp.zeros((2,))
    qp = jnp.zeros((2,))
    small = dict(num_blocks=(1, 1, 1, 1), widths=(4, 4, 4, 4))

    m = mlt_cnn.create_model("ResNetO", **small)
    v = m.init(jax.random.PRNGKey(0), x1, poc, qp, train=False)
    out = m.apply(v, x1, poc, qp, train=False)
    assert out.shape == (2, 4)

    m2 = mlt_cnn.create_model("ResNetORPQ", **small)
    v2 = m2.init(jax.random.PRNGKey(0), x2, poc, qp, train=False)
    assert m2.apply(v2, x2, poc, qp, train=False).shape == (2, 4)
    # PQ variant's head takes 2 extra inputs
    w_pq = v2["params"]["head"]["fc"]["kernel"].shape[0]
    w_no = v["params"]["head"]["fc"]["kernel"].shape[0]
    assert w_pq == w_no + 2

    m3 = mlt_cnn.create_model("GapBigMltCtuOR", **small)
    v3 = m3.init(jax.random.PRNGKey(0), x2, poc, qp, train=False)
    l1, l2, l3 = m3.apply(v3, x2, poc, qp, train=False)
    assert (l1.shape, l2.shape, l3.shape) == ((2, 2), (2, 3), (2, 4))
