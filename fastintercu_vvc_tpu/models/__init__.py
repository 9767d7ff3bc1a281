"""MLT-CNN model family (flax) for fast split-mode decision.

Re-designed from the reference PyTorch archs
(mlt-cnn-python/codes/models/archs/*.py) as TPU-first flax modules:
NHWC layout, bf16-friendly, jit/pjit-compatible.
"""

from .mlt_cnn import (
    BasicBlock,
    PreActBlock,
    MltCnnL3,
    MltCnnL4,
    GapBigMltCtu,
    GapBigMltCu,
    create_model,
)
from .losses import staged_ce_weights, mlt_ctu_loss, mlt_cu_loss, cross_entropy

__all__ = [
    "BasicBlock",
    "PreActBlock",
    "MltCnnL3",
    "MltCnnL4",
    "GapBigMltCtu",
    "GapBigMltCu",
    "create_model",
    "staged_ce_weights",
    "mlt_ctu_loss",
    "mlt_cu_loss",
    "cross_entropy",
]
