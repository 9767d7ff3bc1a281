"""Normative ROM tables (ISO/IEC 23090-3 constants), loaded from the
generated rom.npz (see tools/gen_rom.py — analytic expansion, cross-checked
bit-exact against the normative tables; reference inventory:
vtm-mlt-cpp/source/Lib/CommonLib/RomTr.cpp, Rom.cpp:280 initROM).

All tables are plain numpy int32 on host; compute kernels bake them in as
jnp constants at trace time (TPU equiv of VTM's global ROM arrays).
"""

from __future__ import annotations

import functools
import os

import numpy as np

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                     "rom.npz")


@functools.lru_cache(maxsize=1)
def _tables():
    return dict(np.load(_DATA))


def trans_matrix(kind: str, size: int) -> np.ndarray:
    """6-bit transform core (forward direction: rows are basis vectors).

    kind in {"DCT2", "DCT8", "DST7"}; size in {2,4,8,16,32,64} (DCT2) or
    {4,8,16,32} (DCT8/DST7). Shape [size, size], int32.
    """
    return _tables()[f"{kind}_{size}"]


def scan_diag(w: int, h: int) -> np.ndarray:
    """Up-right-diagonal CG-grouped scan order, [n, 2] (x, y) pairs
    (spec §6.5.2; VTM g_scanOrder[SCAN_GROUPED_4x4][SCAN_DIAG])."""
    return _tables()[f"SCAN_DIAG_{w}x{h}"]


def scan_diag_ungrouped(w: int, h: int) -> np.ndarray:
    """Plain up-right-diagonal scan (VTM SCAN_UNGROUPED; used for the
    CG-grid scan in residual coding)."""
    return _tables()[f"SCAN_DIAG_UNGROUPED_{w}x{h}"]


def log2_sbb_size(log2w: int, log2h: int):
    """Coefficient sub-block (CG) log2 dims (VTM g_log2SbbSize)."""
    t = _tables()["LOG2_SBB_SIZE"]
    return int(t[log2w][log2h][0]), int(t[log2w][log2h][1])


def quant_scales() -> np.ndarray:
    """levelScale[qp%6] forward quant scales (spec §8.7.3 inverse is
    INV_QUANT_SCALES; VTM g_quantScales Rom.cpp)."""
    return _tables()["QUANT_SCALES"]


def inv_quant_scales() -> np.ndarray:
    return _tables()["INV_QUANT_SCALES"]
