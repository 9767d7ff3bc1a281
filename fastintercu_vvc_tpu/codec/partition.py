"""QTMT partition legality + split-mode context derivation.

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/UnitPartitioner.cpp
(QTBTPartitioner::canSplit :458, getImplicitSplit :516) and
ContextModelling.cpp DeriveCtx::CtxSplit.

TPU-first note: these legality rules are pure functions of block
geometry + depths; the batched search precomputes them as masks per
(size, depth) — this module is the scalar reference used by the syntax
writer and the sequential bootstrap encoder.
"""

from __future__ import annotations

import dataclasses

from . import ctx_ids

# split modes (subset of VTM PartSplit)
NO_SPLIT, QT_SPLIT, BT_H, BT_V, TT_H, TT_V = 0, 1, 2, 3, 4, 5


@dataclasses.dataclass
class PartitionConstraints:
    ctu_size: int = 128
    min_cu: int = 4
    min_qt: int = 8
    max_mtt_depth: int = 3
    max_bt_size: int = 32
    max_tt_size: int = 32
    max_tb_size: int = 64


def implicit_split(x: int, y: int, w: int, h: int,
                   pc: PartitionConstraints, pic_w: int | None,
                   pic_h: int | None, last_split: int = QT_SPLIT,
                   mtt_depth: int = 0, ibt: int = 0) -> int:
    """getImplicitSplit parity (UnitPartitioner.cpp:516): the split a
    picture-border-crossing block is forced to take. NO_SPLIT when the
    block is fully inside the picture (or no bounds given).

    ibt: currImplicitBtDepth — implicit BT splits among the ancestors
    (they raise the effective max MTT depth, UnitPartitioner.cpp:370).
    Every ancestor of a border-crossing block is itself implicitly
    split (a fully-inside block has no border-crossing children), so
    currBtDepth == 0 iff no BT occurred on the chain, i.e. iff
    last_split is QT/CTU-level.
    """
    if pic_w is None or pic_h is None:
        return NO_SPLIT
    bl_in = y + h <= pic_h    # bottomLeft in picture (x always in)
    tr_in = x + w <= pic_w    # topRight in picture (y always in)
    if bl_in and tr_in:
        return NO_SPLIT
    bt_allowed = (w <= pc.max_bt_size and h <= pc.max_bt_size
                  and mtt_depth < pc.max_mtt_depth + ibt)
    bt_depth0 = last_split in (QT_SPLIT, NO_SPLIT)
    qt_allowed = w > pc.min_qt and h > pc.min_qt and bt_depth0
    if not bl_in and not tr_in and qt_allowed:
        return QT_SPLIT
    if not bl_in and bt_allowed and w <= pc.max_tb_size:
        return BT_H
    if not tr_in and bt_allowed and h <= pc.max_tb_size:
        return BT_V
    return QT_SPLIT


def can_split(w: int, h: int, qt_depth: int, mtt_depth: int,
              pc: PartitionConstraints, last_split: int = QT_SPLIT,
              tt_mid_of: int | None = None, *, x: int = 0, y: int = 0,
              pic_w: int | None = None, pic_h: int | None = None,
              ibt: int = 0):
    """-> (canNo, canQt, canBh, canBv, canTh, canTv).

    QTBTPartitioner::canSplit parity (UnitPartitioner.cpp:458) for
    luma blocks, single tree, intra/inter-agnostic (no
    MODE_TYPE_INTER small-block rules yet).

    last_split: the split that produced this block (QT_SPLIT also stands
    for CTU level); QT is disallowed below any MTT split.
    tt_mid_of: BT_H/BT_V when this is the middle child of a TT split in
    that direction (parallel-BT restriction), else None.
    x/y/pic_w/pic_h/ibt: block position, picture bounds and implicit-BT
    depth for picture-border implicit splits (UnitPartitioner.cpp:396:
    with an implicit split active only that BT — or QT — is legal, and
    none of the size/depth BT restrictions apply).
    """
    mx_tb = pc.max_tb_size
    min_bt = min_tt = pc.min_cu
    can_no = True
    can_qt = (last_split in (QT_SPLIT, NO_SPLIT)) and w > pc.min_qt
    can_bh = can_bv = can_th = can_tv = True

    impl = implicit_split(x, y, w, h, pc, pic_w, pic_h, last_split,
                          mtt_depth, ibt)
    if impl != NO_SPLIT:
        can_bh = impl == BT_H
        can_bv = impl == BT_V
        if not can_bh and not can_bv and not can_qt:
            can_qt = True
        return False, can_qt, can_bh, can_bv, False, False

    can_btt = mtt_depth < pc.max_mtt_depth + ibt
    if can_btt and (w <= min_bt and h <= min_bt and w <= min_tt
                    and h <= min_tt):
        can_btt = False
    if can_btt and ((w > pc.max_bt_size or h > pc.max_bt_size)
                    and (w > pc.max_tt_size or h > pc.max_tt_size)):
        can_btt = False
    if not can_btt:
        return can_no, can_qt, False, False, False, False

    if tt_mid_of == BT_H:
        can_bh = False
    elif tt_mid_of == BT_V:
        can_bv = False

    if w > pc.max_bt_size or h > pc.max_bt_size:
        can_bh = can_bv = False
    if h <= min_bt:
        can_bh = False
    if w > mx_tb and h <= mx_tb:
        can_bh = False
    if w <= min_bt:
        can_bv = False
    if w <= mx_tb and h > mx_tb:
        can_bv = False
    if h <= 2 * min_tt or h > pc.max_tt_size or w > pc.max_tt_size:
        can_th = False
    if w > mx_tb or h > mx_tb:
        can_th = False
    if w <= 2 * min_tt or w > pc.max_tt_size or h > pc.max_tt_size:
        can_tv = False
    if w > mx_tb or h > mx_tb:
        can_tv = False
    return can_no, can_qt, can_bh, can_bv, can_th, can_tv


def split_children(x, y, w, h, split):
    """Child areas in coding order (Z-order for QT)."""
    if split == QT_SPLIT:
        hw, hh = w // 2, h // 2
        return [(x, y, hw, hh), (x + hw, y, hw, hh),
                (x, y + hh, hw, hh), (x + hw, y + hh, hw, hh)]
    if split == BT_H:
        hh = h // 2
        return [(x, y, w, hh), (x, y + hh, w, hh)]
    if split == BT_V:
        hw = w // 2
        return [(x, y, hw, h), (x + hw, y, hw, h)]
    if split == TT_H:
        q = h // 4
        return [(x, y, w, q), (x, y + q, w, 2 * q), (x, y + 3 * q, w, q)]
    if split == TT_V:
        q = w // 4
        return [(x, y, q, h), (x + q, y, 2 * q, h), (x + 3 * q, y, q, h)]
    raise ValueError(split)


def split_ctx(neigh, x, y, w, h, qt_depth, mtt_depth, cans):
    """DeriveCtx::CtxSplit parity.

    neigh: object with .cu_size(x, y) -> (w, h) or None, and
    .qt_depth(x, y) -> int or None for coded neighbor positions.
    cans: (canNo, canQt, canBh, canBv, canTh, canTv).
    -> (ctxSplit, ctxQt, ctxHv, ctxH12, ctxV12)
    """
    _, can_qt, can_bh, can_bv, can_th, can_tv = cans
    left = neigh.cu_size(x - 1, y)
    above = neigh.cu_size(x, y - 1)

    ctx_spl = 0
    if left is not None:
        ctx_spl += 1 if left[1] < h else 0
    if above is not None:
        ctx_spl += 1 if above[0] < w else 0
    num_split = (2 if can_qt else 0) + can_bh + can_bv + can_th + can_tv
    if num_split > 0:
        num_split -= 1
    ctx_spl += 3 * (num_split >> 1)

    lq = neigh.qt_depth(x - 1, y)
    aq = neigh.qt_depth(x, y - 1)
    ctx_qt = (1 if (lq is not None and lq > qt_depth) else 0)
    ctx_qt += (1 if (aq is not None and aq > qt_depth) else 0)
    ctx_qt += 0 if qt_depth < 2 else 3

    num_hor = (1 if can_bh else 0) + (1 if can_th else 0)
    num_ver = (1 if can_bv else 0) + (1 if can_tv else 0)
    if num_ver == num_hor:
        w_above = above[0] if above is not None else 1
        h_left = left[1] if left is not None else 1
        dep_above = w // w_above
        dep_left = h // h_left
        if dep_above == dep_left or left is None or above is None:
            ctx_hv = 0
        elif dep_above < dep_left:
            ctx_hv = 1
        else:
            ctx_hv = 2
    elif num_ver < num_hor:
        ctx_hv = 3
    else:
        ctx_hv = 4

    ctx_h12 = 1 if mtt_depth <= 1 else 0
    ctx_v12 = 3 if mtt_depth <= 1 else 2
    return ctx_spl, ctx_qt, ctx_hv, ctx_h12, ctx_v12


def write_split_mode(enc, split, cans, ctxs):
    """CABACWriter::split_cu_mode parity."""
    can_no, can_qt, can_bh, can_bv, can_th, can_tv = cans
    ctx_spl, ctx_qt, ctx_hv, ctx_h12, ctx_v12 = ctxs
    can_split = can_qt or can_bh or can_bv or can_th or can_tv
    is_no = split == NO_SPLIT
    if can_no and can_split:
        enc.encode_bin(0 if is_no else 1, ctx_ids.SplitFlag[0] + ctx_spl)
    if is_no:
        return
    can_btt = can_bh or can_bv or can_th or can_tv
    is_qt = split == QT_SPLIT
    if can_qt and can_btt:
        enc.encode_bin(1 if is_qt else 0, ctx_ids.SplitQtFlag[0] + ctx_qt)
    if is_qt:
        return
    can_hor = can_bh or can_th
    can_ver = can_bv or can_tv
    is_ver = split in (BT_V, TT_V)
    if can_ver and can_hor:
        enc.encode_bin(1 if is_ver else 0, ctx_ids.SplitHvFlag[0] + ctx_hv)
    can14 = can_tv if is_ver else can_th
    can12 = can_bv if is_ver else can_bh
    is12 = split == (BT_V if is_ver else BT_H)
    if can12 and can14:
        enc.encode_bin(1 if is12 else 0,
                       ctx_ids.Split12Flag[0] + (ctx_v12 if is_ver else ctx_h12))
