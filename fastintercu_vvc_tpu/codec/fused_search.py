"""Fused whole-frame QT+BT batched partition/mode search.

The reference prunes a depth-first recursive RDO (EncCu::xCompressCU,
EncCu.cpp:541) with a per-CTU CNN (EncModeCtrl::setNewModeList,
EncModeCtrl.cpp:110-149). Here the ENTIRE QT+BT tree of the frame is
evaluated as batched tensor work (SURVEY.md §7.1 "batch, don't
recurse"):

  1. leaf costs for every block geometry class (w, h) reachable by
     QT + BT splits: batched 67-mode intra SATD and, for P/B slices,
     integer full-search ME built from ONE per-8x8-block SAD map per
     reference (larger geometries aggregate 8x8 SADs — no re-search);
  2. rate from the CABAC bit estimator (codec/bitest): split_cu_mode
     bits per geometry/depth from the real context tables, vectorized
     mvd bits vs a causal neighbor predictor, intra/merge mode costs —
     replacing the hand-tuned constants of the QT-only search;
  3. a bottom-up dynamic program over (geometry, BT-depth budget)
     chooses NO/BT_H/BT_V per node and NO/QT at square QT nodes;
  4. the host walk emits exact per-node split decisions + leaf modes
     for the decisions-driven commit pass (codec/encoder).

The MLT-CNN hint contract now carries the reference's FULL class
semantics at the CTU root: {0: no-split, 1: QT, 2: BT_H, 3: BT_V},
with QT fallback when the hinted split is illegal
(EncModeCtrl.cpp:122-138).

TT splits are batched too: every geometry class is evaluated on a
HALF-STRIDE position grid (a CU of size (w, h) always sits at a
multiple of (max(h/2, 8), max(w/2, 8)) — TT middle children are offset
by half their own size), so the DP covers the full QT+BT+TT tree at
CTU 128 / MaxMTTHierarchyDepth 3 (UnitPartitioner.cpp:271 geometry,
EncCu.cpp:1401 split loop). The parallel-TT restriction (no same-
direction BT inside a TT middle child, UnitPartitioner.cpp:408-412) is
modeled with per-node cost variants.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra_batch, rdcost
from . import bitest, contexts, ctx_ids, hls, partition

NO, QT, BH, BV = (partition.NO_SPLIT, partition.QT_SPLIT,
                  partition.BT_H, partition.BT_V)


@dataclasses.dataclass
class FusedDecisions:
    """Per-node split + per-leaf mode decisions from the fused search.

    split: (x, y, w, h) -> partition split const (NO/QT/BT_H/BT_V)
    mode:  (x, y, w, h) -> intra mode int
           | ("inter", (lst, ridx, mvx_int, mvy_int))  internal 1/16 MV
    level: square-grid fallback for implicit-border leaf geometry the
           walk never keyed (same contract as SearchDecisions.level).
    """
    split: dict
    mode: dict
    level: dict = dataclasses.field(default_factory=dict)

    def node_split(self, x, y, w, h):
        return self.split.get((x, y, w, h))

    def lookup_mode(self, x, y, w, h):
        exact = self.mode.get((x, y, w, h))
        if exact is not None:
            return exact
        if not self.level:
            return None
        sizes = sorted(self.level)
        s = min(w, h)
        s = max(sizes[0], min(sizes[-1], s))
        while s not in self.level:
            s //= 2
        lv = self.level[s]
        by, bx = y // s, x // s
        nby, nbx = lv["imode"].shape
        by, bx = min(by, nby - 1), min(bx, nbx - 1)
        if "inter" in lv and lv["inter"][by, bx]:
            return ("inter", {
                "dir": int(lv["dir"][by, bx]),
                "ref0": int(lv["ref0"][by, bx]),
                "mv0": (int(lv["mv0x"][by, bx]),
                        int(lv["mv0y"][by, bx])),
                "ref1": int(lv["ref1"][by, bx]),
                "mv1": (int(lv["mv1x"][by, bx]),
                        int(lv["mv1y"][by, bx])),
                "mlike": bool(lv["mlike"][by, bx])})
        return int(lv["imode"][by, bx])


# ---------------------------------------------------------------------------
# geometry enumeration


def _pc_for(cfg: hls.SeqConfig, slice_type: int):
    if slice_type == hls.I_SLICE:
        return partition.PartitionConstraints(
            ctu_size=cfg.ctu_size, min_cu=1 << cfg.log2_min_cu,
            min_qt=cfg.min_qt_intra,
            max_mtt_depth=cfg.max_mtt_depth_intra,
            max_bt_size=cfg.max_bt_intra, max_tt_size=cfg.max_tt_intra,
            max_tb_size=1 << cfg.log2_max_tb)
    return partition.PartitionConstraints(
        ctu_size=cfg.ctu_size, min_cu=1 << cfg.log2_min_cu,
        min_qt=cfg.min_qt_inter,
        max_mtt_depth=cfg.max_mtt_depth_inter,
        max_bt_size=cfg.max_bt_inter, max_tt_size=cfg.max_tt_inter,
        max_tb_size=1 << cfg.log2_max_tb)


def _geometries(pc, cs, min_qt, D, min_dim=8):
    """All (w, h) classes reachable by QT (to min_qt) then <= D MTT
    (BT or TT) splits. Positions live on the half-stride grids of
    ops.me_frame.class_grid."""
    squares = []
    s = cs
    while s >= min_qt:
        squares.append(s)
        s //= 2
    geoms = set((s, s) for s in squares)
    for s in squares:
        frontier = {(s, s)}
        for d in range(D):
            nxt = set()
            for (w, h) in frontier:
                cans = partition.can_split(
                    w, h, 0, d, pc,
                    last_split=QT if d == 0 else BH)
                if cans[2] and h // 2 >= min_dim:
                    nxt.add((w, h // 2))
                if cans[3] and w // 2 >= min_dim:
                    nxt.add((w // 2, h))
                if cans[4] and h // 4 >= min_dim:
                    nxt.add((w, h // 4))
                    nxt.add((w, h // 2))
                if cans[5] and w // 4 >= min_dim:
                    nxt.add((w // 4, h))
                    nxt.add((w // 2, h))
            geoms |= nxt
            frontier = nxt
    return squares, sorted(geoms, key=lambda g: (-g[0] * g[1], g))


# ---------------------------------------------------------------------------
# device kernels (all shapes static; per-class outputs packed into two
# flat vectors so one encode dispatch costs two downloads, not dozens)


def _device_refs(plane, w, h):
    """top[N, 2w+1] / left[N, 2h+1] org-sample references for every
    block position of the class grid (corner first; borders replicate —
    the commit pass redoes exact reference substitution)."""
    from ..ops import me_frame
    H, W = plane.shape
    ys, xs = me_frame.class_grid(H, W, w, h)
    pad = jnp.pad(plane, ((1, 2 * h), (1, 2 * w)), mode="edge")
    by = jnp.asarray(ys)[:, None, None]
    bx = jnp.asarray(xs)[None, :, None]
    rt = jnp.arange(2 * w + 1)
    rl = jnp.arange(2 * h + 1)
    tops = pad[by, bx + rt[None, None, :]].reshape(-1, 2 * w + 1)
    lefts = pad[by + rl[None, None, :], bx].reshape(-1, 2 * h + 1)
    return tops, lefts


def _device_blocks(plane, w, h):
    from ..ops import me_frame
    H, W = plane.shape
    ys, xs = me_frame.class_grid(H, W, w, h)
    ii = jnp.arange(h)[None, None, :, None]
    jj = jnp.arange(w)[None, None, None, :]
    return plane[jnp.asarray(ys)[:, None, None, None] + ii,
                 jnp.asarray(xs)[None, :, None, None] + jj
                 ].reshape(-1, h, w)


def _satd_nd(a, b, w, h):
    if w >= 8 and h >= 8:
        return rdcost.satd(a, b)
    return rdcost.satd4(a, b)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _intra_leaf_class(plane, w, h, lam, hit_bits, miss_bits):
    """Best intra (mode, cost incl. mode-rate) over all 67 modes for
    one class grid. Two passes: a pure-SATD argmin builds an
    approximate per-block MPM set (planar + left/top winners, like
    the real list's leading entries), then the final argmin charges
    each mode its estimated signalling rate — without this the
    SATD-only winner is nearly always a non-MPM mode and the
    truncated-binary index dominates the I-frame bit budget
    (IntraLumaMpmFlag ~16% of bits). Jitted per class; compiles are
    incremental and shared across CTU configurations."""
    from ..ops import me_frame
    H, W = plane.shape
    ys, xs = me_frame.class_grid(H, W, w, h)
    ny, nx = len(ys), len(xs)
    tops, lefts = _device_refs(plane, w, h)
    blocks = _device_blocks(plane, w, h)
    preds = intra_batch.predict_all_modes(tops, lefts, w, h)
    c = _satd_nd(preds, blocks[None], w, h)              # [67, N]
    base = jnp.argmin(c, axis=0).astype(jnp.int32).reshape(ny, nx)
    left_m = jnp.concatenate([base[:, :1], base[:, :-1]], axis=1)
    top_m = jnp.concatenate([base[:1, :], base[:-1, :]], axis=0)
    modes = jnp.arange(67)[:, None]                      # [67, 1]
    is_mpm = ((modes == 0)
              | (modes == left_m.reshape(-1)[None, :])
              | (modes == top_m.reshape(-1)[None, :]))
    rate = jnp.where(is_mpm, hit_bits, miss_bits)
    cost = c.astype(jnp.float32) + lam * rate
    # top-3 candidate modes per block: the commit pass RD-screens them
    # with real transforms (IntraSearch's candidate-list style instead
    # of a single forced mode)
    negc, top3 = jax.lax.top_k(-cost.T, 3)              # [N, 3]
    return (top3.astype(jnp.int32),
            (-negc[:, 0]).astype(jnp.float32))


def _intra_leaf_device(plane, classes, lam, hit_bits, miss_bits):
    outs = [_intra_leaf_class(plane, w, h, lam, hit_bits, miss_bits)
            for (w, h) in classes]
    return (jnp.concatenate([o[0].reshape(-1) for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


# ---------------------------------------------------------------------------
# single-dispatch whole-frame search: SAD maps + coarse field + every
# intra and inter class evaluated inside ONE jitted program, with the
# decisions and costs packed into four flat vectors (two downloads).
# The per-class jits above remain the building blocks (jit-of-jit
# inlines into the one program) and the fallback for the sharded path.
# Rationale: the axon tunnel charges per dispatch and per
# device->host fetch; at ~40 dispatches + 4 fetches per frame the
# warm RA search spent 4.4 s/frame on orchestration (round-5 TPU
# phase timing) against microseconds of actual TPU compute.


@functools.partial(
    jax.jit,
    static_argnames=("intra_classes", "iclasses", "sr", "bd",
                     "n0", "n1"))
def _search_device_all(jorg, refs0, refs1, cf0, cv0, cf1, cv1,
                       lam_intra, hit_bits, miss_bits, lam_inter, *,
                       intra_classes, iclasses, sr, bd, n0, n1):
    from ..ops import me_frame
    iv_i, cv_i = _intra_leaf_device(jorg, intra_classes, lam_intra,
                                    hit_bits, miss_bits)
    if n0 == 0:
        return iv_i, cv_i, jnp.zeros((0,), jnp.int32), \
            jnp.zeros((0,), jnp.float32)
    pads0 = jnp.stack([jnp.pad(refs0[i], me_frame.PAD, mode="edge")
                       for i in range(n0)]).astype(jnp.int16)
    s80 = jnp.stack([me_frame.sad_map(jorg, refs0[i], sr)
                     for i in range(n0)])
    c0 = me_frame._coarse_best(jorg, [refs0[i] for i in range(n0)], sr)
    ii0 = me_frame._integral(s80)
    if n1 > 0:
        pads1 = jnp.stack([jnp.pad(refs1[i], me_frame.PAD, mode="edge")
                           for i in range(n1)]).astype(jnp.int16)
        s81 = jnp.stack([me_frame.sad_map(jorg, refs1[i], sr)
                         for i in range(n1)])
        c1 = me_frame._coarse_best(jorg,
                                   [refs1[i] for i in range(n1)], sr)
        ii1 = me_frame._integral(s81)
    else:
        pads1, ii1, c1 = pads0, ii0, c0
    iv_parts, cv_parts = [], []
    for (w, h) in iclasses:
        iv2, cv2 = me_frame._class_device_body(
            jorg, pads0, pads1, ii0, ii1, c0, c1, cf0, cv0, cf1, cv1,
            lam_inter, w, h, sr, bd, n0, n1)
        iv_parts.append(iv2)
        cv_parts.append(cv2)
    return (iv_i, cv_i, jnp.concatenate(iv_parts),
            jnp.concatenate(cv_parts))


# ---------------------------------------------------------------------------
# host: leaf costs -> DP -> decision walk


def _pad_to_ctu(plane: np.ndarray, cs: int) -> np.ndarray:
    H, W = plane.shape
    ph, pw = -H % cs, -W % cs
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def search_frame_async(org: np.ndarray, cfg: hls.SeqConfig, qp: int,
                 slice_type: int = hls.I_SLICE,
                 ref_planes=(),
                 split_hints: np.ndarray | None = None,
                 me_range: int = 16, max_bt_depth: int = 2,
                 mesh=None, col_fields=None) -> FusedDecisions:
    """Whole-frame fused QT+BT search.

    ref_planes: [(lst, ridx, plane)] reconstructed reference planes to
    search. The inter leg (ops/me_frame) refines sub-pel, screens
    predictor-like candidates and bi-prediction on device, so the
    commit pass takes the decisions as-is.
    col_fields: optional per-ref_planes-entry (mv_field [H8, W8, 2],
    valid [H8, W8]) collocated-MV candidates (TMVP analog).
    split_hints: per-CTU [nCtuY, nCtuX] int array, -1 = no hint, else
    the MLT-CNN class {0: no-split, 1: QT, 2: BT_H, 3: BT_V}.
    mesh: optional jax.sharding.Mesh — the intra sweep and the SAD map
    run CTU-column-tile sharded with ppermute halo exchange
    (parallel.fused_shard), bit-identical to single-device.
    """
    cs = cfg.ctu_size
    org_p = _pad_to_ctu(np.asarray(org, np.int32), cs)
    H, W = org_p.shape
    pc = _pc_for(cfg, slice_type)
    D = min(pc.max_mtt_depth, max_bt_depth)
    min_qt = pc.min_qt
    squares, geoms = _geometries(pc, cs, min_qt, D)
    # MLT-CNN frame-level work pruning: the reference prunes per-CTU
    # RDO recursion (setNewModeList); the batched analogue prunes the
    # uniform class set — when most CTUs predict no-split (easy
    # content, exactly where the paper reports its largest encode-time
    # savings), the fine geometry classes are dropped from BOTH device
    # legs and the DP. Per-CTU forced splits still apply in the walk.
    if split_hints is not None and np.any(split_hints >= 0):
        hv = split_hints[split_hints >= 0]
        f0 = float(np.mean(hv == 0))
        min_leaf = 32 if f0 >= 0.9 else 16 if f0 >= 0.6 else 0
        if min_leaf:
            geoms = [g for g in geoms
                     if g[0] >= min_leaf and g[1] >= min_leaf]
            squares = [s for s in squares if s >= min_leaf]
            min_qt = max(min_qt, min_leaf)
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    # SATD-domain rate weight. The sqrt(lambda) weight VTM uses for
    # same-size mode preselection underweights rate for PARTITION
    # decisions: comparing J = D + lambda*R across partitions at equal
    # area, the implied SATD-domain weight is ~Qstep (a constant
    # factor above sqrt(lambda)) — without it the DP chases SATD noise
    # into tiny CUs and B-frame skips collapse. RATE_SCALE calibrated
    # on the CTC-shaped clip (bits/PSNR pareto).
    import os as _os
    rate_scale = float(_os.environ.get("FASTINTERCU_RATE_SCALE", "4"))
    lam_satd = float(np.sqrt(lam)) * rate_scale

    ctx_slice = {hls.I_SLICE: contexts.I_SLICE,
                 hls.P_SLICE: contexts.P_SLICE,
                 hls.B_SLICE: contexts.B_SLICE}[slice_type]
    bank = contexts.init_bank(ctx_slice, qp)
    fb = bitest.bank_frac(bank)
    srate = bitest.SplitRate(bank, pc)
    inter_slice = slice_type != hls.I_SLICE and ref_planes
    scale = float(1 << bitest.SCALE_BITS)
    if inter_slice:
        pred_mode_i = fb[ctx_ids.PredMode[0], 1] / scale   # intra in P/B
        pred_mode_p = fb[ctx_ids.PredMode[0], 0] / scale
        skip0 = fb[ctx_ids.SkipFlag[0], 0] / scale
        intra_flags_bits = pred_mode_i + skip0
    else:
        pred_mode_p = 0.0
        intra_flags_bits = 0.0

    classes = tuple(geoms)
    from ..ops import me_frame
    grids = {c: me_frame.class_grid(H, W, c[0], c[1]) for c in classes}
    strides = {c: (max(c[1] // 2, 8), max(c[0] // 2, 8))
               for c in classes}
    jorg = jnp.asarray(org_p)

    # ---- intra leg (classes up to the 64-sample TB limit; larger
    # geometries are inter-only, like VTM's intra checks)
    intra_classes = tuple(c for c in classes
                          if c[0] <= 64 and c[1] <= 64)
    use_mesh = mesh
    scale_f = float(1 << bitest.SCALE_BITS)
    mpm_flag = fb[ctx_ids.IntraLumaMpmFlag[0]]
    hit_bits = float(mpm_flag[1] / scale_f + 2.2)
    miss_bits = float(mpm_flag[0] / scale_f + 5.95)
    # ---- gather reference planes / collocated fields up front (both
    # device paths need them)
    iclasses = tuple(g for g in classes if g[0] >= 8 and g[1] >= 8)
    refs0, r0map, refs1, r1map = [], [], [], []
    c0l, c1l = [], []
    if inter_slice:
        h8, w8 = H // 8, W // 8
        none_colf = (np.zeros((h8, w8, 2), np.int32),
                     np.zeros((h8, w8), bool))
        for k, (lst, ridx, plane) in enumerate(ref_planes):
            p = _pad_to_ctu(np.asarray(plane, np.int32), cs)
            colf = (col_fields[k] if col_fields is not None
                    and k < len(col_fields) else None)
            # keep c0/c1 index-aligned with refs0/refs1: a missing
            # collocated field becomes an all-invalid placeholder
            # (ADVICE r4 #3)
            if lst == 0:
                refs0.append(p)
                r0map.append(ridx)
                c0l.append(colf if colf is not None else none_colf)
            else:
                refs1.append(p)
                r1map.append(ridx)
                c1l.append(colf if colf is not None else none_colf)

    handles = None
    if use_mesh is None:
        # single-dispatch path: everything in one jitted program, two
        # packed downloads. The dispatch is ASYNC (jax enqueues the
        # program); the returned finish() performs the blocking fetch,
        # so a caller can overlap this frame's device search with host
        # work on another frame (gop-level pipelining).
        from ..ops import me_frame as mf
        n0, n1 = len(refs0), len(refs1)

        def stack_or_dummy(planes):
            if planes:
                return jnp.stack([jnp.asarray(p) for p in planes])
            return jorg[None]

        cf0, cv0 = mf.pack_col_fields(c0l, n0, H, W)
        cf1, cv1 = mf.pack_col_fields(c1l, n1, H, W)
        r1arr = stack_or_dummy(refs1) if refs1 else stack_or_dummy(refs0)
        handles = _search_device_all(
            jorg, stack_or_dummy(refs0), r1arr, cf0, cv0, cf1, cv1,
            lam_satd, hit_bits, miss_bits, lam_satd,
            intra_classes=intra_classes,
            iclasses=iclasses if inter_slice else (),
            sr=int(me_range), bd=10, n0=n0, n1=n1)
    else:
        handles = _intra_leaf_device(jorg, intra_classes, lam_satd,
                                     hit_bits, miss_bits)

    def finish() -> FusedDecisions:
        res = None
        if use_mesh is None:
            from ..ops import me_frame as mf
            iv_i, cv_i, iv2, cv2 = handles
            iv = np.asarray(iv_i)
            cv = np.asarray(cv_i)
            if inter_slice:
                res = mf.unpack_class_results(np.asarray(iv2),
                                              np.asarray(cv2),
                                              iclasses, H, W)
        else:
            iv = np.asarray(handles[0])
            cv = np.asarray(handles[1])

        leaf = {}
        off = 0
        for (w, h) in intra_classes:
            ys, xs = grids[(w, h)]
            n = len(ys) * len(xs)
            leaf[(w, h)] = {
                "imode": iv[3 * off:3 * (off + n)]
                .reshape(len(ys), len(xs), 3),
                "icost": (cv[off:off + n].astype(np.float64)
                          + lam_satd * intra_flags_bits
                          ).reshape(len(ys), len(xs)),
            }
            off += n
        for (w, h) in classes:
            if (w, h) not in leaf:
                ys, xs = grids[(w, h)]
                leaf[(w, h)] = {
                    "imode": np.zeros((len(ys), len(xs), 3), np.int32),
                    "icost": np.full((len(ys), len(xs)), 1e18),
                }

        # ---- inter leg (all classes: the SAD base grid is 8x8)
        if inter_slice:
            if res is None:       # sharded path (mesh-driven SAD maps)
                res = me_frame.inter_frame_search(
                    org_p, refs0, refs1, c0l, c1l, iclasses, qp,
                    sr=int(me_range), bd=10, mesh=use_mesh,
                    lam_satd=lam_satd)
            r0m = np.asarray(r0map or [0], np.int32)
            r1m = np.asarray(r1map or [0], np.int32)
            for (w, h) in iclasses:
                r = res[(w, h)]
                lv = leaf[(w, h)]
                pcost = r["cost"] + lam_satd * pred_mode_p
                use_inter = pcost < lv["icost"]
                lv["inter"] = use_inter
                lv["cost"] = np.where(use_inter, pcost, lv["icost"])
                lv["dir"] = r["dir"]
                lv["ref0"] = r0m[np.minimum(r["ref0"], len(r0m) - 1)]
                lv["mv0x"], lv["mv0y"] = r["mv0x"], r["mv0y"]
                lv["ref1"] = r1m[np.minimum(r["ref1"], len(r1m) - 1)]
                lv["mv1x"], lv["mv1y"] = r["mv1x"], r["mv1y"]
                lv["mlike"] = r["mlike"]
            for (w, h) in classes:
                if (w, h) not in iclasses:
                    leaf[(w, h)]["cost"] = leaf[(w, h)]["icost"]
        else:
            for lv in leaf.values():
                lv["cost"] = lv["icost"]

        # ---- DP over (geometry, MTT budget, parallel-TT variant)
        # B[v][d][(w,h)]: best cost of a (w,h) node with d MTT splits left
        # under variant v (0 unrestricted, 1 = BT_H banned at this node =
        # TT_H middle child, 2 = BT_V banned). CH mirrors the choice.
        geoset = set(geoms)
        NVAR = 3
        B = [[dict() for _ in range(D + 1)] for _ in range(NVAR)]
        CH = [[dict() for _ in range(D + 1)] for _ in range(NVAR)]

        def sub(arr, cc, ys_pos, xs_pos):
            syc, sxc = strides[cc]
            return arr[(ys_pos // syc)[:, None], (xs_pos // sxc)[None, :]]

        def node_rates(w, h, d, var):
            mtt = D - d
            last = QT if mtt == 0 else BH
            qtd = max(0, (cs // max(w, h)).bit_length() - 1)
            tmid = (partition.BT_H if var == 1
                    else partition.BT_V if var == 2 else None)
            return srate.costs(w, h, qtd, mtt, last, tmid)

        TH, TV = partition.TT_H, partition.TT_V
        for d in range(D + 1):
            for (w, h) in geoms:
                ys, xs = grids[(w, h)]
                comp = {}
                if d > 0:
                    cc = (w, h // 2)
                    if cc in geoset:
                        ch = B[0][d - 1][cc]
                        comp[BH] = (sub(ch, cc, ys, xs)
                                    + sub(ch, cc, ys + h // 2, xs))
                    cc = (w // 2, h)
                    if cc in geoset:
                        ch = B[0][d - 1][cc]
                        comp[BV] = (sub(ch, cc, ys, xs)
                                    + sub(ch, cc, ys, xs + w // 2))
                    cf, cm = (w, h // 4), (w, h // 2)
                    if cf in geoset and cm in geoset:
                        f = B[0][d - 1][cf]
                        m = B[1][d - 1][cm]
                        comp[TH] = (sub(f, cf, ys, xs)
                                    + sub(m, cm, ys + h // 4, xs)
                                    + sub(f, cf, ys + 3 * (h // 4), xs))
                    cf, cm = (w // 4, h), (w // 2, h)
                    if cf in geoset and cm in geoset:
                        f = B[0][d - 1][cf]
                        m = B[2][d - 1][cm]
                        comp[TV] = (sub(f, cf, ys, xs)
                                    + sub(m, cm, ys, xs + w // 4)
                                    + sub(f, cf, ys, xs + 3 * (w // 4)))
                base = leaf[(w, h)]["cost"]
                for var in range(NVAR):
                    rates = node_rates(w, h, d, var)
                    cost = base + lam_satd * rates.get(NO, 0.0)
                    choice = np.zeros(cost.shape, np.int8)
                    for sp in (BH, BV, TH, TV):
                        if sp not in rates or sp not in comp:
                            continue
                        agg = comp[sp] + lam_satd * rates[sp]
                        m = agg < cost
                        choice = np.where(m, np.int8(sp), choice)
                        cost = np.where(m, agg, cost)
                    B[var][d][(w, h)] = cost
                    CH[var][d][(w, h)] = choice

        # QT levels: T[s] = min(MTT subtree at s, 4 x T[s/2] + qt rate),
        # evaluated on the s-ALIGNED grid (QT nodes are never half-offset)
        def aligned(arr, c, s):
            sy, sx = strides[c]
            ya = (np.arange(H // s) * s) // sy
            xa = (np.arange(W // s) * s) // sx
            return arr[ya[:, None], xa[None, :]]

        T = {min_qt: aligned(B[0][D][(min_qt, min_qt)],
                             (min_qt, min_qt), min_qt)}
        QSPLIT = {}
        for s in sorted(squares)[1:]:
            child = T[s // 2]
            nby, nbx = child.shape
            rates = node_rates(s, s, D, 0)
            agg = (child.reshape(nby // 2, 2, nbx // 2, 2).sum(axis=(1, 3))
                   + lam_satd * rates.get(QT, 1.0))
            leafbt = aligned(B[0][D][(s, s)], (s, s), s)
            QSPLIT[s] = (agg < leafbt) & (QT in rates)
            T[s] = np.where(QSPLIT[s], agg, leafbt)

        # ---- decision walk
        dec_split: dict = {}
        dec_mode: dict = {}

        def record_leaf(x, y, w, h):
            dec_split[(x, y, w, h)] = NO
            lv = leaf[(w, h)]
            sy, sx = strides[(w, h)]
            by, bx = y // sy, x // sx
            if inter_slice and lv.get("inter") is not None \
                    and lv["inter"][by, bx]:
                dec_mode[(x, y, w, h)] = ("inter", {
                    "dir": int(lv["dir"][by, bx]),
                    "ref0": int(lv["ref0"][by, bx]),
                    "mv0": (int(lv["mv0x"][by, bx]),
                            int(lv["mv0y"][by, bx])),
                    "ref1": int(lv["ref1"][by, bx]),
                    "mv1": (int(lv["mv1x"][by, bx]),
                            int(lv["mv1y"][by, bx])),
                    "mlike": bool(lv["mlike"][by, bx])})
            else:
                dec_mode[(x, y, w, h)] = tuple(
                    int(m) for m in lv["imode"][by, bx])

        def walk_bt(x, y, w, h, d, var=0):
            sy, sx = strides[(w, h)]
            ch = int(CH[var][d][(w, h)][y // sy, x // sx]) if d > 0 else NO
            if ch == BH:
                dec_split[(x, y, w, h)] = BH
                walk_bt(x, y, w, h // 2, d - 1)
                walk_bt(x, y + h // 2, w, h // 2, d - 1)
            elif ch == BV:
                dec_split[(x, y, w, h)] = BV
                walk_bt(x, y, w // 2, h, d - 1)
                walk_bt(x + w // 2, y, w // 2, h, d - 1)
            elif ch == TH:
                dec_split[(x, y, w, h)] = TH
                q = h // 4
                walk_bt(x, y, w, q, d - 1)
                walk_bt(x, y + q, w, 2 * q, d - 1, 1)
                walk_bt(x, y + 3 * q, w, q, d - 1)
            elif ch == TV:
                dec_split[(x, y, w, h)] = TV
                q = w // 4
                walk_bt(x, y, q, h, d - 1)
                walk_bt(x + q, y, 2 * q, h, d - 1, 2)
                walk_bt(x + 3 * q, y, q, h, d - 1)
            else:
                record_leaf(x, y, w, h)

        def walk_q(x, y, s, forced=None):
            do_qt = bool(QSPLIT[s][y // s, x // s]) if s > min_qt else False
            if forced is not None:
                # MLT-CNN root hint, reference class semantics
                # (EncModeCtrl.cpp:122-138: the requested split only, with
                # QT as the fallback when it is illegal)
                if forced == 0:
                    record_leaf(x, y, s, s)
                    return
                if forced in (2, 3) and D > 0:
                    rates = node_rates(s, s, D, 0)
                    want = BH if forced == 2 else BV
                    child = (s, s // 2) if want == BH else (s // 2, s)
                    if want in rates and child in geoset:
                        dec_split[(x, y, s, s)] = want
                        if want == BH:
                            walk_bt(x, y, s, s // 2, D - 1)
                            walk_bt(x, y + s // 2, s, s // 2, D - 1)
                        else:
                            walk_bt(x, y, s // 2, s, D - 1)
                            walk_bt(x + s // 2, y, s // 2, s, D - 1)
                        return
                do_qt = s > min_qt         # forced == 1 or QT fallback
            if do_qt:
                dec_split[(x, y, s, s)] = QT
                hs = s // 2
                for (cx, cy) in ((x, y), (x + hs, y), (x, y + hs),
                                 (x + hs, y + hs)):
                    walk_q(cx, cy, hs)
            else:
                walk_bt(x, y, s, s, D)

        # I-slice CTUs larger than 64 split implicitly (the intra TB limit)
        force_root_qt = slice_type == hls.I_SLICE and cs > 64
        for cy in range(H // cs):
            for cx in range(W // cs):
                forced = None
                if split_hints is not None and split_hints[cy, cx] >= 0:
                    forced = int(split_hints[cy, cx])
                if force_root_qt and forced in (None, 0, 2, 3):
                    dec_split[(cx * cs, cy * cs, cs, cs)] = QT
                    hs = cs // 2
                    for (qx, qy) in ((cx * cs, cy * cs),
                                     (cx * cs + hs, cy * cs),
                                     (cx * cs, cy * cs + hs),
                                     (cx * cs + hs, cy * cs + hs)):
                        walk_q(qx, qy, hs)
                else:
                    walk_q(cx * cs, cy * cs, cs, forced)

        level = {}
        for sq in squares:
            lv = leaf[(sq, sq)]
            c = (sq, sq)
            ent = {"imode": aligned(lv["imode"][..., 0], c, sq)}
            if inter_slice and lv.get("inter") is not None:
                for f in ("inter", "dir", "ref0", "mv0x", "mv0y",
                          "ref1", "mv1x", "mv1y", "mlike"):
                    ent[f] = aligned(lv[f], c, sq)
            level[sq] = ent
        return FusedDecisions(dec_split, dec_mode, level)

    return finish


def search_frame(org: np.ndarray, cfg: hls.SeqConfig, qp: int,
                 **kw) -> FusedDecisions:
    """Synchronous whole-frame fused search (dispatch + fetch + DP).
    See search_frame_async for the pipelined two-phase form."""
    return search_frame_async(org, cfg, qp, **kw)()

