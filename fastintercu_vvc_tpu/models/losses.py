"""Losses for MLT-CNN training.

Parity: mlt-cnn-python/codes/models/losses/losses.py:70-84 (staged
multi-level cross-entropy: curriculum weighting that shifts emphasis from
the coarse head to the fine head over training), :156+ (4-level variant).

jit-friendly: stage selection is jnp.where over the iteration scalar, not
Python branching, so one compiled function serves the whole run.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  class_weights=None) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels; optional
    per-class sample weights (inverse-frequency balancing for the
    heavily skewed split-label distribution)."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = jnp.asarray(class_weights, jnp.float32)[labels]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-6)


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


def scaled_ctu_stages(total_steps: int):
    """The reference schedule's stage FRACTIONS (150k/300k/450k of
    600k = 25/50/75%) applied to an arbitrary run length — a 600k-iter
    schedule on a 20k-step run otherwise never leaves stage 1 and the
    l2/l3 heads (weights 0.02/0.01) stay untrained."""
    fr = [t / 600_000 for t, _ in _CTU_STAGES[:-1]]
    return tuple((int(f * total_steps), w)
                 for f, (_, w) in zip(fr, _CTU_STAGES[:-1])) \
        + (_CTU_STAGES[-1],)


def make_ctu_loss(total_steps: int | None = None, class_weights=None):
    """Staged 3-level CE with run-length-scaled stages and optional
    per-head class weights (tuple of 3 vectors, lengths 2/3/4)."""
    stages = _CTU_STAGES if total_steps is None \
        else scaled_ctu_stages(total_steps)
    cw = class_weights or (None, None, None)

    def loss_fn(outs, labels, step):
        w = staged_ce_weights(step, stages)
        ls = jnp.stack([cross_entropy(o, l, c)
                        for o, l, c in zip(outs, labels, cw)])
        return jnp.sum(w * ls)
    return loss_fn


def mlt_cu_loss(outs, labels, step):
    """Staged 4-level CE loss (CU nets)."""
    w = staged_ce_weights(step, _CU_STAGES)
    losses = jnp.stack([cross_entropy(o, l) for o, l in zip(outs, labels)])
    return jnp.sum(w * losses)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """argmax accuracy (parity: codes/metrics/accuracy.py:3-18)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
