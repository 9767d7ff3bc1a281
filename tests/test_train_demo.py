"""End-to-end MLT-CNN learning demo: the training loop converges on a
separable split/no-split signal, and the trained model's hints steer
the batched encoder (the full reference deployment loop:
train (mlt-cnn-python) -> predict (EncCu CNN hook) -> prune -> encode),
oracle bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastintercu_vvc_tpu.codec import batch_search, encoder, hls
from fastintercu_vvc_tpu.models import losses, mlt_cnn, pruning, train

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")

S = 64          # CTU size for the demo (model is GAP -> size-agnostic)


def _dataset(n_per_class, rng):
    """Flat CTUs (label 0 = no-split) vs noise CTUs (label 1 = QT)."""
    flat = (rng.randint(200, 800, (n_per_class, 1, 1))
            + rng.randint(-2, 3, (n_per_class, S, S))).clip(0, 1023)
    noise = rng.randint(0, 1024, (n_per_class, S, S))
    x = np.concatenate([flat, noise]).astype(np.int32)
    y = np.concatenate([np.zeros(n_per_class, np.int32),
                        np.ones(n_per_class, np.int32)])
    perm = rng.permutation(len(y))
    return x[perm], y[perm]


def _features(x):
    return mlt_cnn.make_ctu_features(jnp.asarray(x),
                                     jnp.zeros_like(jnp.asarray(x)), 10)


def train_tiny_model(steps=200, seed=0):
    import optax
    rng = np.random.RandomState(seed)
    x, y = _dataset(32, rng)
    model = mlt_cnn.MltCnnL3(num_blocks=(1, 1, 1, 1), widths=(8, 8, 8, 8))
    tx = optax.adam(3e-3)
    state = train.create_train_state(model, jax.random.PRNGKey(seed), tx)

    # final-stage curriculum: all weight on the level-3 head (the one
    # predict_split_modes deploys), exercising staged_ce_weights
    def loss_fn(outs, labels, step):
        return losses.mlt_ctu_loss(outs, labels, step + 500_000)

    step = jax.jit(train.make_train_step(model, tx, loss_fn=loss_fn))
    feats = _features(x)
    batch = {"x": feats,
             "poc": jnp.zeros(len(y)), "qp": jnp.full((len(y),), 32.0),
             "labels": (jnp.asarray(y), jnp.asarray(y), jnp.asarray(y))}
    hist = []
    for _ in range(steps):
        state, metrics = step(state, batch)
        hist.append(float(metrics["loss"]))
    return model, state, hist, (x, y)


def test_training_converges_and_classifies():
    model, state, hist, (x, y) = train_tiny_model()
    assert hist[-1] < 0.1 * hist[0], (hist[0], hist[-1])
    _, _, lvl3 = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        _features(x), jnp.zeros(len(y)), jnp.full((len(y),), 32.0),
        train=False)
    acc = float(losses.accuracy(lvl3, jnp.asarray(y)))
    assert acc >= 0.9, acc


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="VTM oracle decoder not built")
def test_trained_model_prunes_encode_bitexact():
    model, state, _, _ = train_tiny_model(steps=200)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # composite frame: left half flat (expect no-split), right half noise
    rng = np.random.RandomState(7)
    w, h = 128, 64
    org = np.empty((h, w), np.int32)
    org[:, :64] = 512 + rng.randint(-2, 3, (h, 64))
    org[:, 64:] = rng.randint(0, 1024, (h, 64))

    classes = pruning.predict_split_modes(model, variables, org, None,
                                          poc=0, qp=32, ctu_size=S)
    hints = pruning.split_hints_from_classes(classes)
    assert hints.shape == (1, 2)
    assert hints[0, 0] == 0 and hints[0, 1] == 1, hints

    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=S, min_qt_intra=8, min_qt_inter=8, qp=32)
    decs = batch_search.search_intra_frame(org, cfg, 32, split_hints=hints)
    res = encoder.FrameEncoder(cfg).encode_frame(org, decisions=decs)
    # hints honored in the committed stream
    assert np.all((res.cu_map[:, :16] >> 16) == 64)     # flat CTU whole
    assert (res.cu_map[:, 16:] >> 16).max() <= 32       # noise CTU split

    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(res.bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=120)
        assert r.returncode == 0, r.stdout.decode()[-1200:]
        dec = np.fromfile(yp, dtype="<u2").reshape(h, w).astype(int)
    np.testing.assert_array_equal(dec, res.recon)
