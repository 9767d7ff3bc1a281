"""CABAC context bank construction from the normative init tables.

Parity: VTM CommonLib/Contexts.cpp CtxStore::init (init values +
window-size codes per context; slice-type selects the init row;
Slice::getCabacInitFlag swaps B<->P rows when cabac_init_flag=1,
spec §9.3.2.2).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from . import cabac, ctx_ids

B_SLICE, P_SLICE, I_SLICE = 0, 1, 2

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                     "ctx.npz")


@functools.lru_cache(maxsize=1)
def _tables():
    return dict(np.load(_DATA))


def num_ctx() -> int:
    return ctx_ids.NUM_CTX


def init_bank(slice_type: int, qp: int,
              cabac_init_flag: bool = False) -> cabac.ContextBank:
    """Fresh context bank initialized for (sliceType, qp)."""
    t = _tables()
    rows = {B_SLICE: t["init_b"], P_SLICE: t["init_p"], I_SLICE: t["init_i"]}
    st = slice_type
    if cabac_init_flag and slice_type != I_SLICE:
        st = P_SLICE if slice_type == B_SLICE else B_SLICE
    init_ids = rows[st]
    rates = t["rate"]
    bank = cabac.ContextBank(ctx_ids.NUM_CTX)
    bank.init_all(qp, init_ids, rates)
    return bank
