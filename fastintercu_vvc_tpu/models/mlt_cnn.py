"""MLT-CNN split-mode classifiers, TPU-first flax implementation.

Behavioral parity targets (reference, for capability comparison only):
  - mlt-cnn-python/codes/models/archs/mlt_ctu_or_pq_arch.py:239-306
    (``MltCnnL3ORPQv4(BasicBlock, [2,2,2,2])`` a.k.a. ``GapBigMltCtuORPQ`` —
    the deployed 128x128 CTU net: stem conv 2->32, four stride-2 resnet
    stages of widths (32, 64, 128, 256), three classifier heads after
    stages 2/3/4, each GAP -> concat(poc, qp) -> Linear with 2/3/4 classes).
  - mlt-cnn-python/codes/models/archs/mlt_cu_or_pq_arch.py (4-level CU
    variant with a 6-class level-4 head incl. TT splits, for 64/32/16 CUs).

TPU-first design choices (deliberately different from the torch reference):
  - NHWC layout (XLA TPU conv native layout; reference is NCHW).
  - Inference runs over a *batch of all CTUs of a frame* in one call
    (the reference round-trips host->CUDA per CTU and reloads the
    TorchScript module from disk per CTU, vtm-mlt-cpp EncCu.cpp:894-905).
  - bf16-compatible: params stay f32, activations castable; BatchNorm in
    f32 for stability.
  - Everything shape-static; no data-dependent Python control flow.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    """Post-activation resnet basic block (conv-bn-relu-conv-bn + shortcut).

    Parity: mlt_ctu_or_pq_arch.py:32-57.
    """

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_planes = x.shape[-1]
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name=name,
        )
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(
            self.planes, (3, 3), strides=(1, 1),
            padding=1, use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)

        if self.stride != 1 or in_planes != self.planes:
            sc = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut_conv",
            )(x)
            sc = norm("shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class PreActBlock(nn.Module):
    """Pre-activation resnet block. Parity: mlt_ctu_or_pq_arch.py:5-29."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_planes = x.shape[-1]
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name=name,
        )
        out = nn.relu(norm("bn1")(x))
        if self.stride != 1 or in_planes != self.planes:
            sc = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut_conv",
            )(out)
        else:
            sc = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(
            self.planes, (3, 3), strides=(1, 1),
            padding=1, use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        return out + sc


def _stage(block_cls, planes, num_blocks, stride, dtype, name_prefix):
    """A resnet stage: first block strided, rest stride-1."""
    blocks = []
    strides = [stride] + [1] * (num_blocks - 1)
    for i, s in enumerate(strides):
        blocks.append(block_cls(planes=planes, stride=s, dtype=dtype,
                                name=f"{name_prefix}_{i}"))
    return blocks


class _GapHead(nn.Module):
    """Classifier head: global-avg-pool -> concat(poc, qp) -> Linear.

    Parity: mlt_ctu_or_pq_arch.py:282-297 (adaptive_avg_pool2d (1,1) + cat).
    """

    num_classes: int
    dtype: Dtype = jnp.float32
    use_pq: bool = True      # ablation: drop the POC/QP side inputs

    @nn.compact
    def __call__(self, feat, poc, qp):
        # feat: [N, H, W, C]; poc/qp: [N]
        g = jnp.mean(feat.astype(jnp.float32), axis=(1, 2))  # [N, C]
        if self.use_pq:
            side = jnp.stack([poc.astype(jnp.float32),
                              qp.astype(jnp.float32)], axis=-1)  # [N, 2]
            g = jnp.concatenate([g, side], axis=-1)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(g)


class MltCnnL3(nn.Module):
    """Three-level multi-task CNN over 128x128 CTUs ("GapBig" topology).

    forward(x[N,128,128,2], poc[N], qp[N]) -> (lvl1[N,2], lvl2[N,3], lvl3[N,4])

    Level-3 classes: {0: no-split, 1: QT, 2: BT_H, 3: BT_V}
    (vtm-mlt-cpp EncCu.cpp:909-921 consumes argmax of the level-3 head).

    Parity: MltCnnL3ORPQv4 (mlt_ctu_or_pq_arch.py:239-299) with
    stage widths ``widths`` and block counts ``num_blocks``.
    """

    num_blocks: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (32, 64, 128, 256)
    num_classes: Sequence[int] = (2, 3, 4)
    block: type = BasicBlock
    dtype: Dtype = jnp.float32
    use_pq: bool = True      # ablation: GapBigMltCtuOR (no POC/QP)

    @nn.compact
    def __call__(self, x, poc, qp, *, train: bool = False):
        x = x.astype(self.dtype)
        out = nn.Conv(self.widths[0], (3, 3), strides=(1, 1), padding=1,
                      use_bias=False, dtype=self.dtype, name="stem")(x)
        # stage 0 and 1 feed the first head
        for blk in _stage(self.block, self.widths[0], self.num_blocks[0], 2,
                          self.dtype, "layer0"):
            out = blk(out, train=train)
        for blk in _stage(self.block, self.widths[1], self.num_blocks[1], 2,
                          self.dtype, "layer1"):
            out = blk(out, train=train)
        lvl1 = _GapHead(self.num_classes[0], use_pq=self.use_pq,
                        name="branch1")(out, poc, qp)
        for blk in _stage(self.block, self.widths[2], self.num_blocks[2], 2,
                          self.dtype, "layer2"):
            out = blk(out, train=train)
        lvl2 = _GapHead(self.num_classes[1], use_pq=self.use_pq,
                        name="branch2")(out, poc, qp)
        for blk in _stage(self.block, self.widths[3], self.num_blocks[3], 2,
                          self.dtype, "layer3"):
            out = blk(out, train=train)
        lvl3 = _GapHead(self.num_classes[2], use_pq=self.use_pq,
                        name="branch3")(out, poc, qp)
        return lvl1, lvl2, lvl3


class MltCnnL4(nn.Module):
    """Four-level variant for sub-CTU CUs (64/32/16) — adds a 6-class level-4
    head including TT_H/TT_V.

    Parity: MltCnnL4ORPQv4 (mlt_cu_or_pq_arch.py:59-130). The reference
    trained these but disabled them in C++; we keep them first-class so the
    batched partition search can prune at every tree level.
    """

    num_blocks: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (32, 64, 128, 256)
    num_classes: Sequence[int] = (2, 3, 4, 6)
    block: type = BasicBlock
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, poc, qp, *, train: bool = False):
        x = x.astype(self.dtype)
        out = nn.Conv(self.widths[0], (3, 3), strides=(1, 1), padding=1,
                      use_bias=False, dtype=self.dtype, name="stem")(x)
        heads = []
        for i, blk_count in enumerate(self.num_blocks):
            for blk in _stage(self.block, self.widths[i], blk_count, 2,
                              self.dtype, f"layer{i}"):
                out = blk(out, train=train)
            if i >= len(self.num_blocks) - len(self.num_classes):
                head_idx = i - (len(self.num_blocks) - len(self.num_classes))
                heads.append(
                    _GapHead(self.num_classes[head_idx],
                             name=f"branch{head_idx + 1}")(out, poc, qp))
        return tuple(heads)


class ResNetSplit(nn.Module):
    """Single-head ResNet-18-style baseline (ablation family).

    Parity targets: mlt-cnn-python/codes/models/archs/resnet_arch.py
    (org-only, 1ch), resnet_org_resi_arch.py (org+resi, 2ch) and
    resnet_org_resi_pq_arch.py (+ POC/QP side inputs) — the paper's
    ablations against the multi-level MLT heads. One 4-class split
    decision at the CTU root, no intermediate-level supervision.

    forward(x[N,S,S,in_ch], poc[N], qp[N]) -> logits[N,4]
    """

    num_blocks: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (32, 64, 128, 256)
    num_classes: int = 4
    use_pq: bool = False
    block: type = BasicBlock
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, poc, qp, *, train: bool = False):
        out = nn.Conv(self.widths[0], (3, 3), strides=(1, 1), padding=1,
                      use_bias=False, dtype=self.dtype,
                      name="stem")(x.astype(self.dtype))
        for i, n in enumerate(self.num_blocks):
            for blk in _stage(self.block, self.widths[i], n, 2,
                              self.dtype, f"layer{i}"):
                out = blk(out, train=train)
        return _GapHead(self.num_classes, use_pq=self.use_pq,
                        name="head")(out, poc, qp)


def GapBigMltCtu(dtype: Dtype = jnp.float32) -> MltCnnL3:
    """The deployed 128x128 CTU net (factory parity:
    mlt_ctu_or_pq_arch.py:305-306 ``GapBigMltCtuORPQ``)."""
    return MltCnnL3(dtype=dtype)


def GapBigMltCu(dtype: Dtype = jnp.float32) -> MltCnnL4:
    """4-level CU net for 64/32/16 blocks (mlt_cu_or_pq_arch.py:130)."""
    return MltCnnL4(num_classes=(2, 3, 4, 6), dtype=dtype)


_REGISTRY = {
    "GapBigMltCtuORPQ": GapBigMltCtu,
    "GapBigMltCuORPQ": GapBigMltCu,
    # ablation/baseline family (reference archs/ dir: resnet_arch.py,
    # resnet_org_resi_arch.py, resnet_org_resi_pq_arch.py,
    # mlt_ctu_or_arch.py)
    "ResNetO": lambda **kw: ResNetSplit(**kw),            # org-only 1ch
    "ResNetOR": lambda **kw: ResNetSplit(**kw),           # org+resi 2ch
    "ResNetORPQ": lambda **kw: ResNetSplit(use_pq=True, **kw),
    "GapBigMltCtuOR": lambda **kw: MltCnnL3(use_pq=False, **kw),
}


def create_model(name: str, **kwargs):
    """Factory by config string (parity with archs/__init__.py
    ``define_network`` registry-by-name)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown arch {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def init_params(model: nn.Module, rng: jax.Array, batch: int = 1,
                size: int = 128):
    """Initialize model variables with example shapes."""
    x = jnp.zeros((batch, size, size, 2), jnp.float32)
    poc = jnp.zeros((batch,), jnp.float32)
    qp = jnp.zeros((batch,), jnp.float32)
    return model.init(rng, x, poc, qp, train=False)


def make_ctu_features(org: jnp.ndarray, pred: jnp.ndarray,
                      bit_depth: int = 10) -> jnp.ndarray:
    """Build the 2-channel (org, |org-pred|) input from integer sample
    planes, normalized to [0, 1].

    Parity: vtm-mlt-cpp EncCu.cpp:806-887 (absdiff then /1023 clamp) and
    mlt_ctu_or_pq_dataset.py:56-65. Batched: org/pred are [N, H, W] int
    arrays for all CTUs of a frame at once.
    """
    maxval = jnp.float32((1 << bit_depth) - 1)
    orgf = org.astype(jnp.float32)
    resi = jnp.abs(orgf - pred.astype(jnp.float32))
    feat = jnp.stack([orgf / maxval, resi / maxval], axis=-1)
    return jnp.clip(feat, 0.0, 1.0)
