"""Losses for MLT-CNN training.

Parity: mlt-cnn-python/codes/models/losses/losses.py:70-84 (staged
multi-level cross-entropy: curriculum weighting that shifts emphasis from
the coarse head to the fine head over training), :156+ (4-level variant).

jit-friendly: stage selection is jnp.where over the iteration scalar, not
Python branching, so one compiled function serves the whole run.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return jnp.mean(nll)


def _log_softmax(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=-1, keepdims=True))


# (iter threshold, (w_l1, w_l2, w_l3)) — losses.py:70-84.
_CTU_STAGES = (
    (150_000, (0.97, 0.02, 0.01)),
    (300_000, (0.1, 0.7, 0.2)),
    (450_000, (0.1, 0.1, 0.8)),
    (2**31, (0.0, 0.0, 1.0)),
)

# losses.py:156-173 (4-level).
_CU_STAGES = (
    (120_000, (0.97, 0.01, 0.01, 0.01)),
    (240_000, (0.1, 0.7, 0.1, 0.1)),
    (360_000, (0.1, 0.1, 0.7, 0.1)),
    (480_000, (0.1, 0.1, 0.2, 0.6)),
    (2**31, (0.0, 0.0, 0.0, 1.0)),
)


def staged_ce_weights(step: jnp.ndarray, stages=_CTU_STAGES) -> jnp.ndarray:
    """Per-head loss weights for the current iteration (traced scalar)."""
    nlevels = len(stages[0][1])
    w = jnp.asarray(stages[-1][1], jnp.float32)
    for thresh, weights in reversed(stages[:-1]):
        w = jnp.where(step <= thresh, jnp.asarray(weights, jnp.float32), w)
    return w.reshape(nlevels)


def mlt_ctu_loss(outs, labels, step):
    """Staged 3-level CE loss. outs/labels: tuples of 3."""
    w = staged_ce_weights(step, _CTU_STAGES)
    losses = jnp.stack([cross_entropy(o, l) for o, l in zip(outs, labels)])
    return jnp.sum(w * losses)


def mlt_cu_loss(outs, labels, step):
    """Staged 4-level CE loss (CU nets)."""
    w = staged_ce_weights(step, _CU_STAGES)
    losses = jnp.stack([cross_entropy(o, l) for o, l in zip(outs, labels)])
    return jnp.sum(w * losses)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """argmax accuracy (parity: codes/metrics/accuracy.py:3-18)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
