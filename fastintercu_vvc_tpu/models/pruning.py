"""MLT-CNN split-mode pruning — the FastInterCU-VVC contribution,
TPU-first.

Reference behavior (vtm-mlt-cpp): inside the RDO loop, per 128x128 CTU,
copy org + |org - mergePred| to host, reload the TorchScript model from
disk, run one CUDA inference, argmax the level-3 head, and rewrite the
remaining test-mode stack (EncCu.cpp:746-931; EncModeCtrl.cpp:110-149
setNewModeList):
  pred == 0          -> drop all split modes (test leaf modes only)
  pred in {1, 2, 3}  -> test ONLY that split (QT fallback if illegal)

Here: ONE batched inference for all CTUs of a frame (no host round
trips, no model reloads), producing the split-hint array consumed by
codec.batch_search (and, later, the full QTMT batched search).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import mlt_cnn

# level-3 head classes (EncCu.cpp:909-921)
NO_SPLIT, QT, BT_H, BT_V = 0, 1, 2, 3


def extract_ctu_batch(org: np.ndarray, pred: np.ndarray | None,
                      ctu_size: int, bit_depth: int = 10):
    """Tile a frame into CTU feature tensors [N, ctu, ctu, 2]
    (org, |org-pred|) — parity with EncCu.cpp:806-887 but batched.
    pred=None uses zeros (intra frames have no merge predictor)."""
    H, W = org.shape
    assert H % ctu_size == 0 and W % ctu_size == 0
    if pred is None:
        pred = np.zeros_like(org)
    o = jnp.asarray(org.reshape(H // ctu_size, ctu_size,
                                W // ctu_size, ctu_size)
                    .swapaxes(1, 2).reshape(-1, ctu_size, ctu_size))
    p = jnp.asarray(pred.reshape(H // ctu_size, ctu_size,
                                 W // ctu_size, ctu_size)
                    .swapaxes(1, 2).reshape(-1, ctu_size, ctu_size))
    return mlt_cnn.make_ctu_features(o, p, bit_depth)


def predict_split_modes(model, variables, org: np.ndarray,
                        pred: np.ndarray | None, poc: int, qp: int,
                        ctu_size: int = 128,
                        bit_depth: int = 10) -> np.ndarray:
    """-> per-CTU predicted split class [nCtuY, nCtuX] in {0..3}
    (argmax of the level-3 head, EncCu.cpp:909-921)."""
    H, W = org.shape
    feats = extract_ctu_batch(org, pred, ctu_size, bit_depth)
    n = feats.shape[0]
    pocs = jnp.full((n,), float(poc))
    qps = jnp.full((n,), float(qp))
    _, _, lvl3 = model.apply(variables, feats, pocs, qps, train=False)
    cls = np.asarray(jnp.argmax(lvl3, axis=-1))
    return cls.reshape(H // ctu_size, W // ctu_size)


def make_hints_fn(ckpt_dir: str, ctu_size: int = 128,
                  bit_depth: int = 10, inter_only: bool = True):
    """Load a trained checkpoint and return the split_hints_fn
    deployment closure for gop.RandomAccessEncoder /
    BatchedSequenceEncoder: (luma, ref_recon_or_None, poc, qp) ->
    per-CTU class hints [nCtuY, nCtuX] (full 4-class semantics for the
    fused search), or None when gated off.

    The reference fires its CNN only on 128x128 luma CTUs of inter
    slices (EncCu.cpp:746-756); inter_only mirrors that — I slices
    search unpruned. Frames are edge-padded to a CTU multiple; hints
    for partial border CTUs are cleared to -1 (no hint), matching the
    in-picture gate."""
    import os
    from . import train as train_mod
    from . import mlt_cnn
    model = mlt_cnn.GapBigMltCtu()
    variables = train_mod.load_weights(
        os.path.join(ckpt_dir, "weights.msgpack"), model)

    def hints_fn(luma, ref, poc, qp):
        if ref is None and inter_only:
            return None
        luma = np.asarray(luma)
        H, W = luma.shape
        ph, pw = -H % ctu_size, -W % ctu_size
        lp = np.pad(luma, ((0, ph), (0, pw)), mode="edge")
        rp = None if ref is None else np.pad(
            np.asarray(ref), ((0, ph), (0, pw)), mode="edge")
        cls = predict_split_modes(model, variables, lp, rp, poc, qp,
                                  ctu_size, bit_depth)
        if ph or pw:
            cls = cls.astype(np.int32)
            if ph:
                cls[-1, :] = -1           # partial bottom row
            if pw:
                cls[:, -1] = -1           # partial right column
        return cls.astype(np.int32)

    return hints_fn


def split_hints_from_classes(classes: np.ndarray) -> np.ndarray:
    """Map level-3 classes to batch_search split hints.

    setNewModeList parity: 0 -> leaf only (hint 0); 1/2/3 -> split
    (QT-only search: BT_H/BT_V fall back to QT, mirroring the
    partitioner.canSplit fallback in EncModeCtrl.cpp:133-138)."""
    return np.where(classes == NO_SPLIT, 0, 1).astype(np.int32)
