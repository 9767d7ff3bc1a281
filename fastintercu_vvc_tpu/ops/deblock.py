"""Deblocking filter (normative, spec §8.8.3).

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/LoopFilter.cpp —
loopFilterPic (two whole-picture passes: all vertical edges, then all
horizontal), xDeblockCU edge marking/BS loop (:~300-445),
xGetBoundaryStrengthSingle (:717), xEdgeFilterLuma (:935),
xEdgeFilterChroma (:~1185), xPelFilterLuma/Chroma, xFilteringPandQ +
xBilinearFilter (long filters), xUseStrongFiltering, xCalcDP/DQ;
tc/beta tables (:61-72).

Scope: TU == PU == CU (no ISP/SBT/affine-subblock edges yet), single
tree, constant QP per frame, uni or no prediction per CU (P slices).

Host-side numpy implementation processing edges in the exact reference
order (CTU raster -> CU coding order -> 4-sample segments); the batched
Pallas variant will mirror this math.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

TC_TABLE = np.asarray([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 4, 4, 4,
    4, 5, 5, 5, 5, 7, 7, 8, 9, 10, 10, 11, 13, 14, 15, 17, 19, 21, 24,
    25, 29, 33, 36, 41, 45, 51, 57, 64, 71, 80, 89, 100, 112, 125, 141,
    157, 177, 198, 222, 250, 280, 314, 352, 395], np.int32)
BETA_TABLE = np.asarray([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86, 88],
    np.int32)
DEFAULT_INTRA_TC_OFFSET = 2
MAX_QP = 63


@dataclasses.dataclass
class DeblockInfo:
    """Per-4x4-luma-unit coding info (SoA, from the encoder maps)."""
    cu_x0: np.ndarray
    cu_y0: np.ndarray
    cu_w: np.ndarray
    cu_h: np.ndarray
    is_intra: np.ndarray
    cbf_y: np.ndarray
    cbf_cb: np.ndarray
    cbf_cr: np.ndarray
    mv: np.ndarray         # [gh, gw, 2] internal 1/16 (L0)
    ref_poc: np.ndarray    # -1 when not inter / no L0
    mv1: np.ndarray | None = None        # L1
    ref_poc1: np.ndarray | None = None
    slice_is_b: bool = False
    # explicit transform-unit geometry (SBT, implicit max-TB tiling);
    # when absent, TUs are the CUs tiled to 64
    tu_x0: np.ndarray | None = None
    tu_y0: np.ndarray | None = None
    tu_w: np.ndarray | None = None
    tu_h: np.ndarray | None = None
    # subblock-motion CUs (affine / SbTMVP): 8-grid internal edges
    # (LoopFilter.cpp:360 mvSubBlocks) with capped filter lengths
    sub_pu: np.ndarray | None = None
    # per-4x4 luma QP (cu-delta-QP streams); None -> the scalar qp arg
    qp_map: np.ndarray | None = None
    # chroma QP mapping table indexed by qp + 6*(bd-8) (for qp_map)
    chroma_tab: np.ndarray | None = None
    # ISP CUs: luma-only TU split — internal TU edges are not chroma
    # edges (LoopFilter marks TU edges per component; ISP sub-TUs have
    # no chroma blocks)
    isp: np.ndarray | None = None

    def at(self, x, y):
        return y // 4, x // 4


class _Line:
    """1-D view of samples across an edge: line[k] = sample at signed
    offset k (negative = P side)."""

    def __init__(self, plane, x, y, horizontal_edge):
        self.p = plane
        self.x = x
        self.y = y
        self.h = horizontal_edge   # True: offsets step in y

    def __getitem__(self, k):
        if self.h:
            return int(self.p[self.y + k, self.x])
        return int(self.p[self.y, self.x + k])

    def __setitem__(self, k, v):
        if self.h:
            self.p[self.y + k, self.x] = v
        else:
            self.p[self.y, self.x + k] = v


def _calc_dp(line, chroma_hor_ctb=False):
    if chroma_hor_ctb:
        return abs(line[-2] - 2 * line[-2] + line[-1])
    return abs(line[-3] - 2 * line[-2] + line[-1])


def _calc_dq(line):
    return abs(line[0] - 2 * line[1] + line[2])


def _use_strong(line, d, beta, tc, side_p_large=False, side_q_large=False,
                max_p=7, max_q=7, chroma_hor_ctb=False):
    m4, m3, m7, m0, m2 = line[0], line[-1], line[3], line[-4], line[-2]
    sp3 = abs(m2 - m3) if chroma_hor_ctb else abs(m0 - m3)
    sq3 = abs(m7 - m4)
    d_strong = sp3 + sq3
    if side_p_large or side_q_large:
        if side_p_large:
            if max_p == 7:
                mp5, mp6, mp7, mp4 = line[-5], line[-6], line[-7], line[-8]
                sp3 = sp3 + abs(mp5 - mp6 - mp7 + mp4)
            else:
                mp4 = line[-6]
            sp3 = (sp3 + abs(m0 - mp4) + 1) >> 1
        if side_q_large:
            if max_q == 7:
                m8, m9, m10, m11 = line[4], line[5], line[6], line[7]
                sq3 = sq3 + abs(m8 - m9 - m10 + m11)
            else:
                m11 = line[5]
            sq3 = (sq3 + abs(m11 - m7) + 1) >> 1
        return ((sp3 + sq3) < (beta * 3 >> 5)) and (d < (beta >> 4)) \
            and (abs(m3 - m4) < ((tc * 5 + 1) >> 1))
    return (d_strong < (beta >> 3)) and (d < (beta >> 2)) \
        and (abs(m3 - m4) < ((tc * 5 + 1) >> 1))


def _bilinear(line, ref_middle, ref_p, ref_q, np_side, nq_side, tc):
    db7 = [59, 50, 41, 32, 23, 14, 5]
    db5 = [58, 45, 32, 19, 6]
    db3 = [53, 32, 11]
    tc7 = [6, 5, 4, 3, 2, 1, 1]
    tc3 = [6, 4, 2]
    dbP = db7 if np_side == 7 else (db5 if np_side == 5 else db3)
    dbQ = db7 if nq_side == 7 else (db5 if nq_side == 5 else db3)
    tcP = tc3 if np_side == 3 else tc7
    tcQ = tc3 if nq_side == 3 else tc7
    for pos in range(np_side):
        src = line[-1 - pos]
        cval = (tc * tcP[pos]) >> 1
        line[-1 - pos] = min(max(
            (ref_middle * dbP[pos] + ref_p * (64 - dbP[pos]) + 32) >> 6,
            src - cval), src + cval)
    for pos in range(nq_side):
        src = line[pos]
        cval = (tc * tcQ[pos]) >> 1
        line[pos] = min(max(
            (ref_middle * dbQ[pos] + ref_q * (64 - dbQ[pos]) + 32) >> 6,
            src - cval), src + cval)


def _filter_pq(line, np_side, nq_side, tc):
    """xFilteringPandQ parity (long luma filter)."""
    # P-side sample at offset -1-k == srcP[-k*offset]; Q at k == srcQ[k]
    def P(k):
        return line[-1 - k]

    def Q(k):
        return line[k]

    if np_side == 7:
        ref_p = (P(6) + P(7) + 1) >> 1
    elif np_side == 5:
        ref_p = (P(4) + P(5) + 1) >> 1
    else:
        ref_p = (P(2) + P(3) + 1) >> 1
    if nq_side == 7:
        ref_q = (Q(6) + Q(7) + 1) >> 1
    elif nq_side == 5:
        ref_q = (Q(4) + Q(5) + 1) >> 1
    else:
        ref_q = (Q(2) + Q(3) + 1) >> 1

    if np_side == nq_side:
        if np_side == 5:
            ref_m = (2 * (P(0) + Q(0) + P(1) + Q(1) + P(2) + Q(2))
                     + P(3) + Q(3) + P(4) + Q(4) + 8) >> 4
        else:
            ref_m = (2 * (P(0) + Q(0)) + P(1) + Q(1) + P(2) + Q(2)
                     + P(3) + Q(3) + P(4) + Q(4) + P(5) + Q(5)
                     + P(6) + Q(6) + 8) >> 4
    else:
        if np_side > nq_side:
            big_p, big_q = True, False
        else:
            big_p, big_q = False, True
        lo = min(np_side, nq_side)
        hi = max(np_side, nq_side)
        # helpers seen from the larger side
        L = P if np_side > nq_side else Q     # larger side access
        S = Q if np_side > nq_side else P     # smaller side access
        if hi == 7 and lo == 5:
            ref_m = (2 * (P(0) + Q(0) + P(1) + Q(1))
                     + P(2) + Q(2) + P(3) + Q(3) + P(4) + Q(4)
                     + P(5) + Q(5) + 8) >> 4
        elif hi == 7 and lo == 3:
            ref_m = (2 * (L(0) + S(0)) + S(0) + 2 * (S(1) + S(2))
                     + L(1) + S(1) + L(2) + L(3) + L(4) + L(5) + L(6)
                     + 8) >> 4
        else:   # 5 and 3
            ref_m = (P(0) + Q(0) + P(1) + Q(1) + P(2) + Q(2)
                     + P(3) + Q(3) + 4) >> 3
    _bilinear(line, ref_m, ref_p, ref_q, np_side, nq_side, tc)


def _pel_filter_luma(line, tc, sw, thr_cut, filter_p2, filter_q2, clip_hi,
                     side_p_large=False, side_q_large=False,
                     max_p=3, max_q=3):
    m4, m3 = line[0], line[-1]
    m5, m2 = line[1], line[-2]
    m6, m1 = line[2], line[-3]
    m7, m0 = line[3], line[-4]
    tc3 = [3, 2, 1]
    if sw:
        if side_p_large or side_q_large:
            _filter_pq(line, max_p if side_p_large else 3,
                       max_q if side_q_large else 3, tc)
        else:
            line[-1] = min(max((m1 + 2 * m2 + 2 * m3 + 2 * m4 + m5 + 4) >> 3,
                               m3 - tc3[0] * tc), m3 + tc3[0] * tc)
            line[0] = min(max((m2 + 2 * m3 + 2 * m4 + 2 * m5 + m6 + 4) >> 3,
                              m4 - tc3[0] * tc), m4 + tc3[0] * tc)
            line[-2] = min(max((m1 + m2 + m3 + m4 + 2) >> 2,
                               m2 - tc3[1] * tc), m2 + tc3[1] * tc)
            line[1] = min(max((m3 + m4 + m5 + m6 + 2) >> 2,
                              m5 - tc3[1] * tc), m5 + tc3[1] * tc)
            line[-3] = min(max((2 * m0 + 3 * m1 + m2 + m3 + m4 + 4) >> 3,
                               m1 - tc3[2] * tc), m1 + tc3[2] * tc)
            line[2] = min(max((m3 + m4 + m5 + 3 * m6 + 2 * m7 + 4) >> 3,
                              m6 - tc3[2] * tc), m6 + tc3[2] * tc)
    else:
        delta = (9 * (m4 - m3) - 3 * (m5 - m2) + 8) >> 4
        if abs(delta) < thr_cut:
            delta = min(max(delta, -tc), tc)
            line[-1] = min(max(m3 + delta, 0), clip_hi)
            line[0] = min(max(m4 - delta, 0), clip_hi)
            tc2 = tc >> 1
            if filter_p2:
                d1 = min(max((((m1 + m3 + 1) >> 1) - m2 + delta) >> 1,
                             -tc2), tc2)
                line[-2] = min(max(m2 + d1, 0), clip_hi)
            if filter_q2:
                d2 = min(max((((m6 + m4 + 1) >> 1) - m5 - delta) >> 1,
                             -tc2), tc2)
                line[1] = min(max(m5 + d2, 0), clip_hi)


def _pel_filter_chroma(line, tc, sw, clip_hi, large_boundary,
                       chroma_hor_ctb):
    m0, m1, m2, m3 = line[-4], line[-3], line[-2], line[-1]
    m4, m5, m6, m7 = line[0], line[1], line[2], line[3]
    if sw:
        if chroma_hor_ctb:
            line[-1] = min(max((3 * m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3,
                               m3 - tc), m3 + tc)
            line[0] = min(max((2 * m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3,
                              m4 - tc), m4 + tc)
            line[1] = min(max((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3,
                              m5 - tc), m5 + tc)
            line[2] = min(max((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3,
                              m6 - tc), m6 + tc)
        else:
            line[-3] = min(max((3 * m0 + 2 * m1 + m2 + m3 + m4 + 4) >> 3,
                               m1 - tc), m1 + tc)
            line[-2] = min(max((2 * m0 + m1 + 2 * m2 + m3 + m4 + m5 + 4) >> 3,
                               m2 - tc), m2 + tc)
            line[-1] = min(max((m0 + m1 + m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3,
                               m3 - tc), m3 + tc)
            line[0] = min(max((m1 + m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3,
                              m4 - tc), m4 + tc)
            line[1] = min(max((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3,
                              m5 - tc), m5 + tc)
            line[2] = min(max((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3,
                              m6 - tc), m6 + tc)
    else:
        delta = min(max((((m4 - m3) << 2) + m2 - m5 + 4) >> 3, -tc), tc)
        line[-1] = min(max(m3 + delta, 0), clip_hi)
        line[0] = min(max(m4 - delta, 0), clip_hi)


def _mv_ge(a, b, thr=8):
    return abs(int(a[0]) - int(b[0])) >= thr or \
        abs(int(a[1]) - int(b[1])) >= thr


def _bs_luma(info: DeblockInfo, xq, yq, hor, tu_edge=True):
    """Luma boundary strength at sample position (xq, yq) against the
    P neighbor (left or above). -> 0/1/2
    (xGetBoundaryStrengthSingle parity incl. the B-slice both-lists
    rule, UnitTools/LoopFilter.cpp:717-905).  tu_edge=False: internal
    subblock-motion edge — the cbf rule does not apply."""
    gq = info.at(xq, yq)
    gp = info.at(xq - (0 if hor else 4), yq - (4 if hor else 0))
    if info.is_intra[gq] or info.is_intra[gp]:
        return 2
    if tu_edge and (info.cbf_y[gq] or info.cbf_y[gp]):
        return 1

    zero = (0, 0)
    p0, q0 = int(info.ref_poc[gp]), int(info.ref_poc[gq])
    if info.mv1 is not None and info.slice_is_b:
        p1 = int(info.ref_poc1[gp])
        q1 = int(info.ref_poc1[gq])
        mvp0 = tuple(info.mv[gp]) if p0 >= 0 else zero
        mvp1 = tuple(info.mv1[gp]) if p1 >= 0 else zero
        mvq0 = tuple(info.mv[gq]) if q0 >= 0 else zero
        mvq1 = tuple(info.mv1[gq]) if q1 >= 0 else zero
        if ((p0 == q0 and p1 == q1) or (p0 == q1 and p1 == q0)):
            if p0 != p1:
                if p0 == q0:
                    return 1 if (_mv_ge(mvq0, mvp0)
                                 or _mv_ge(mvq1, mvp1)) else 0
                return 1 if (_mv_ge(mvq1, mvp0)
                             or _mv_ge(mvq0, mvp1)) else 0
            a = _mv_ge(mvq0, mvp0) or _mv_ge(mvq1, mvp1)
            b = _mv_ge(mvq1, mvp0) or _mv_ge(mvq0, mvp1)
            return 1 if (a and b) else 0
        return 1

    # P-slice uni-pred rule
    if p0 < 0 or q0 < 0:
        return 0 if p0 == q0 else 1
    if p0 != q0:
        return 1
    return 1 if _mv_ge(info.mv[gq], info.mv[gp]) else 0


def _bs_chroma(info: DeblockInfo, xq, yq, hor):
    """-> (bs_cb, bs_cr) at luma position (xq, yq)."""
    gq = info.at(xq, yq)
    gp = info.at(xq - (0 if hor else 4), yq - (4 if hor else 0))
    if info.is_intra[gq] or info.is_intra[gp]:
        return 2, 2
    cb = 1 if (info.cbf_cb[gq] or info.cbf_cb[gp]) else 0
    cr = 1 if (info.cbf_cr[gq] or info.cbf_cr[gp]) else 0
    return cb, cr


def _cu_coding_order(info: DeblockInfo, x, y, w, h, out):
    """Reconstruct z-order CU traversal from the CU maps.

    Border CTUs extend past the picture (implicit splits confine real
    CUs to the in-picture part): grid lookups clamp to the map and
    fully-outside children are skipped."""
    ngy, ngx = info.cu_x0.shape
    if y // 4 >= ngy or x // 4 >= ngx:
        return
    g = info.at(x, y)
    if (int(info.cu_x0[g]), int(info.cu_y0[g])) == (x, y) and \
            int(info.cu_w[g]) == w and int(info.cu_h[g]) == h:
        out.append((x, y, w, h))
        return
    # infer split: QT, BT_H, BT_V, TT_H, TT_V — pick the one whose child
    # boundaries are not crossed by any CU
    def fits(children):
        for (cx, cy, cw, chh) in children:
            for gy in range(cy // 4, min((cy + chh) // 4, ngy)):
                for gx in range(cx // 4, min((cx + cw) // 4, ngx)):
                    x0, y0 = int(info.cu_x0[gy, gx]), int(info.cu_y0[gy, gx])
                    if not (cx <= x0 and cy <= y0):
                        return False
                    if x0 + int(info.cu_w[gy, gx]) > cx + cw or \
                       y0 + int(info.cu_h[gy, gx]) > cy + chh:
                        return False
        return True

    candidates = []
    if w == h and w >= 8:
        hw, hh = w // 2, h // 2
        candidates.append([(x, y, hw, hh), (x + hw, y, hw, hh),
                           (x, y + hh, hw, hh), (x + hw, y + hh, hw, hh)])
    if h >= 8:
        candidates.append([(x, y, w, h // 2), (x, y + h // 2, w, h // 2)])
    if w >= 8:
        candidates.append([(x, y, w // 2, h), (x + w // 2, y, w // 2, h)])
    if h >= 16:
        q = h // 4
        candidates.append([(x, y, w, q), (x, y + q, w, 2 * q),
                           (x, y + 3 * q, w, q)])
    if w >= 16:
        q = w // 4
        candidates.append([(x, y, q, h), (x + q, y, 2 * q, h),
                           (x + 3 * q, y, q, h)])
    for ch in candidates:
        if fits(ch):
            for (cx, cy, cw, chh) in ch:
                _cu_coding_order(info, cx, cy, cw, chh, out)
            return
    raise AssertionError(f"cannot infer partition at {(x, y, w, h)}")


def deblock_frame(recon_y: np.ndarray, recon_cb, recon_cr,
                  info: DeblockInfo, qp: int, qp_chroma: int,
                  bit_depth: int = 10, ctu_size: int = 64,
                  force_python: bool = False):
    """In-place deblocking of a frame (both passes).

    qp: luma QP (without bd offset); qp_chroma: mapped chroma QP
    (without bd offset) used for tc/beta lookup on chroma edges.

    Dispatches to the native C port (native/loopfilter.c, bit-exact
    twin of this file) when available; force_python pins the readable
    numpy path (tests cross-check the two).
    """
    if not force_python and not os.environ.get("FASTINTERCU_PY_DEBLOCK"):
        from .. import native
        if native.lf_deblock_frame(recon_y, recon_cb, recon_cr, info,
                                   qp, qp_chroma, bit_depth, ctu_size):
            return
    _deblock_frame_py(recon_y, recon_cb, recon_cr, info, qp, qp_chroma,
                      bit_depth, ctu_size)


def _deblock_frame_py(recon_y: np.ndarray, recon_cb, recon_cr,
                      info: DeblockInfo, qp: int, qp_chroma: int,
                      bit_depth: int = 10, ctu_size: int = 64):
    """Readable numpy twin (source of truth for the C port)."""
    H, W = recon_y.shape
    clip_hi = (1 << bit_depth) - 1
    bdscale = 1 << (bit_depth - 8)
    chroma = recon_cb is not None

    cu_lists = {}
    sub_lists = {}
    for cty in range(0, H, ctu_size):
        for ctx in range(0, W, ctu_size):
            out = []
            _cu_coding_order(info, ctx, cty, ctu_size, ctu_size, out)
            # deblocking edges follow TU boundaries: use the explicit
            # TU geometry when present (SBT, implicit max-TB tiling),
            # else tile CUs to 64
            tus = []
            for (cx, cy, cw, chh) in out:
                if info.tu_x0 is not None:
                    seen = set()
                    for gy in range(cy // 4, (cy + chh) // 4):
                        for gx in range(cx // 4, (cx + cw) // 4):
                            r = (int(info.tu_x0[gy, gx]),
                                 int(info.tu_y0[gy, gx]),
                                 int(info.tu_w[gy, gx]),
                                 int(info.tu_h[gy, gx]))
                            if r not in seen and r[2] > 0:
                                seen.add(r)
                                tus.append(r)
                else:
                    tw, th = min(cw, 64), min(chh, 64)
                    for ty in range(cy, cy + chh, th):
                        for tx in range(cx, cx + cw, tw):
                            tus.append((tx, ty, tw, th))
            cu_lists[(ctx, cty)] = tus
            if info.sub_pu is not None:
                sub = []
                for (cx, cy, cw, chh) in out:
                    if not info.sub_pu[cy // 4, cx // 4]:
                        continue
                    tu_rows = {t[1] for t in tus
                               if t[0] <= cx < t[0] + t[2]}
                    tu_cols = {t[0] for t in tus
                               if t[1] <= cy < t[1] + t[3]}
                    for off in range(8, chh, 8):
                        if cy + off not in tu_rows:
                            sub.append((cx, cy + off, cw, 4, True,
                                        cy, chh))
                    for off in range(8, cw, 8):
                        if cx + off not in tu_cols:
                            sub.append((cx + off, cy, 4, chh, False,
                                        cx, cw))
                sub_lists[(ctx, cty)] = sub

    for hor in (False, True):        # vertical pass first, then horizontal
        for cty in range(0, H, ctu_size):
            for ctx in range(0, W, ctu_size):
                for (cx, cy, cw, chh) in cu_lists[(ctx, cty)]:
                    _deblock_cu_edge(recon_y, recon_cb, recon_cr, info,
                                     cx, cy, cw, chh, hor, qp, qp_chroma,
                                     clip_hi, bdscale, ctu_size, chroma)
                for e in sub_lists.get((ctx, cty), ()):
                    ex, ey, ew, eh, e_hor, pu0, pu_len = e
                    if e_hor != hor:
                        continue
                    _deblock_cu_edge(recon_y, recon_cb, recon_cr, info,
                                     ex, ey, ew, eh, hor, qp, qp_chroma,
                                     clip_hi, bdscale, ctu_size, chroma,
                                     tu_edge=False, pu0=pu0,
                                     pu_len=pu_len)


def _deblock_cu_edge(ry, rcb, rcr, info, cx, cy, cw, ch, hor, qp, qp_c,
                     clip_hi, bdscale, ctu_size, chroma, tu_edge=True,
                     pu0=0, pu_len=0):
    """Filter the CU's leading edge (top for hor, left for ver).
    tu_edge=False: internal subblock-motion edge (luma only, motion-BS
    only, filter lengths per
    LoopFilter::xSetMaxFilterLengthPQForCodingSubBlocks)."""
    H, W = ry.shape
    if hor:
        if cy == 0:
            return
        edge_units = cw // 4
    else:
        if cx == 0:
            return
        edge_units = ch // 4

    # ---- luma ----
    for u in range(edge_units):
        if hor:
            px, py = cx + 4 * u, cy
        else:
            px, py = cx, cy + 4 * u
        bs = _bs_luma(info, px, py, hor, tu_edge)
        if bs == 0:
            continue
        gq = info.at(px, py)
        gp = info.at(px - (0 if hor else 4), py - (4 if hor else 0))
        # transform-block size on each side (CUs > 64 tile into 64)
        if info.tu_w is not None:
            size_q = int(info.tu_h[gq] if hor else info.tu_w[gq])
            size_p = int(info.tu_h[gp] if hor else info.tu_w[gp])
        else:
            size_q = min(int(info.cu_h[gq] if hor else info.cu_w[gq]),
                         64)
            size_p = min(int(info.cu_h[gp] if hor else info.cu_w[gp]),
                         64)
        small = size_p <= 4 or size_q <= 4
        max_q = 1 if small else (7 if size_q >= 32 else 3)
        max_p = 1 if small else (7 if size_p >= 32 else 3)
        if info.sub_pu is not None:
            if tu_edge:
                # transform edges of subblock-motion CUs cap at 5; the
                # P side only when the edge is internal to the same PU
                if info.sub_pu[gq]:
                    max_q = min(max_q, 5)
                    same_cu = (int(info.cu_x0[gp]) == int(info.cu_x0[gq])
                               and int(info.cu_y0[gp])
                               == int(info.cu_y0[gq]))
                    if same_cu:
                        max_p = min(max_p, 5)
            else:
                off = (py - pu0) if hor else (px - pu0)

                def is_tu(o):
                    a = pu0 + o
                    g = (a // 4, px // 4) if hor else (py // 4, a // 4)
                    t = info.tu_y0 if hor else info.tu_x0
                    return t is not None and int(t[g]) == a
                near4 = is_tu(off - 4) or (off + 4 >= pu_len)                     or is_tu(off + 4)
                near8 = (off == 8) or is_tu(off - 8)                     or (off + 8 >= pu_len) or is_tu(off + 8)
                max_q = max_p = 1 if near4 else (2 if near8 else 3)
        side_p_large = max_p > 3
        side_q_large = max_q > 3
        if hor and (py % ctu_size) == 0:
            side_p_large = False

        if info.qp_map is not None:
            qp_ed = (int(info.qp_map[gp]) + int(info.qp_map[gq]) + 1) >> 1
        else:
            qp_ed = qp
        idx_tc = min(max(qp_ed + DEFAULT_INTRA_TC_OFFSET * (bs - 1), 0),
                     MAX_QP + DEFAULT_INTRA_TC_OFFSET)
        idx_b = min(max(qp_ed, 0), MAX_QP)
        bit_depth = clip_hi.bit_length()
        tc = (int(TC_TABLE[idx_tc]) << (bit_depth - 10)) if bit_depth >= 10 \
            else ((int(TC_TABLE[idx_tc]) + (1 << (9 - bit_depth)))
                  >> (10 - bit_depth))
        beta = int(BETA_TABLE[idx_b]) * bdscale
        side_thresh = (beta + (beta >> 1)) >> 3
        thr_cut = tc * 10

        def line(i):
            if hor:
                return _Line(ry, px + i, py, True)
            return _Line(ry, px, py + i, False)

        l0, l3 = line(0), line(3)
        dp0, dq0 = _calc_dp(l0), _calc_dq(l0)
        dp3, dq3 = _calc_dp(l3), _calc_dq(l3)
        dp0L, dq0L, dp3L, dq3L = dp0, dq0, dp3, dq3
        if side_p_large:
            dp0L = (dp0L + abs(l0[-6] - 2 * l0[-5] + l0[-4]) + 1) >> 1
            dp3L = (dp3L + abs(l3[-6] - 2 * l3[-5] + l3[-4]) + 1) >> 1
        if side_q_large:
            dq0L = (dq0L + abs(l0[3] - 2 * l0[4] + l0[5]) + 1) >> 1
            dq3L = (dq3L + abs(l3[3] - 2 * l3[4] + l3[5]) + 1) >> 1

        use_long = False
        if side_p_large or side_q_large:
            d0L = dp0L + dq0L
            d3L = dp3L + dq3L
            dL = d0L + d3L
            if dL < beta:
                filter_p = (dp0L + dp3L) < side_thresh
                filter_q = (dq0L + dq3L) < side_thresh
                swL = _use_strong(l0, 2 * d0L, beta, tc, side_p_large,
                                  side_q_large, max_p, max_q) and \
                    _use_strong(l3, 2 * d3L, beta, tc, side_p_large,
                                side_q_large, max_p, max_q)
                if swL:
                    use_long = True
                    for i in range(4):
                        _pel_filter_luma(line(i), tc, True, thr_cut,
                                         filter_p, filter_q, clip_hi,
                                         side_p_large, side_q_large,
                                         max_p, max_q)
        if not use_long:
            d0 = dp0 + dq0
            d3 = dp3 + dq3
            d = d0 + d3
            if d < beta:
                filter_p = filter_q = False
                if max_p > 1 and max_q > 1:
                    filter_p = (dp0 + dp3) < side_thresh
                    filter_q = (dq0 + dq3) < side_thresh
                sw = False
                if max_p > 2 and max_q > 2:
                    sw = _use_strong(l0, 2 * d0, beta, tc) and \
                        _use_strong(l3, 2 * d3, beta, tc)
                for i in range(4):
                    _pel_filter_luma(line(i), tc, sw, thr_cut,
                                     filter_p, filter_q, clip_hi)

    # ---- chroma (4:2:0; edges on the 8-chroma-sample grid) ----
    if not chroma or not tu_edge:
        return
    if hor:
        if (cy // 4) % 4 != 0:
            return
    else:
        if (cx // 4) % 4 != 0:
            return
    loop_len = 2          # uiPelsInPartChroma for minCU 4 at 4:2:0
    n_units = (cw if hor else ch) // 4
    for u in range(n_units):
        if hor:
            px, py = cx + 4 * u, cy
        else:
            px, py = cx, cy + 4 * u
        bs_cb, bs_cr = _bs_chroma(info, px, py, hor)
        if bs_cb == 0 and bs_cr == 0:
            continue
        gq = info.at(px, py)
        if info.isp is not None and info.isp[gq]:
            # internal ISP luma TU edge: no chroma TU boundary here
            internal = (py != int(info.cu_y0[gq])) if hor \
                else (px != int(info.cu_x0[gq]))
            if internal:
                continue
        gp = info.at(px - (0 if hor else 4), py - (4 if hor else 0))
        # chroma sizes in chroma samples (ISP: the chroma TU is the
        # whole CU — the luma sub-TU dims do not apply)
        if info.tu_w is not None:
            def _csize(g):
                if info.isp is not None and info.isp[g]:
                    return int(info.cu_h[g] if hor
                               else info.cu_w[g]) // 2
                return int(info.tu_h[g] if hor else info.tu_w[g]) // 2
            size_q = _csize(gq)
            size_p = _csize(gp)
        else:
            size_q = min(int(info.cu_h[gq] if hor else info.cu_w[gq]),
                         64) // 2
            size_p = min(int(info.cu_h[gp] if hor else info.cu_w[gp]),
                         64) // 2
        max_len = 3 if (size_q >= 8 and size_p >= 8) else 1
        large_boundary = max_len >= 3
        chroma_hor_ctb = hor and (py % ctu_size) == 0
        xc, yc = px // 2, py // 2
        bit_depth = clip_hi.bit_length()
        if info.qp_map is not None:
            avg = (int(info.qp_map[gp]) + int(info.qp_map[gq]) + 1) >> 1
            bd_off = 6 * (clip_hi.bit_length() - 8)
            qp_c_ed = int(info.chroma_tab[avg + bd_off])
        else:
            qp_c_ed = qp_c
        for ci, (plane, bs) in enumerate(((rcb, bs_cb), (rcr, bs_cr))):
            if not (bs == 2 or (large_boundary and bs == 1)):
                continue
            idx_tc = min(max(qp_c_ed + DEFAULT_INTRA_TC_OFFSET * (bs - 1),
                             0), MAX_QP + DEFAULT_INTRA_TC_OFFSET)
            tc = (int(TC_TABLE[idx_tc]) << (bit_depth - 10)) \
                if bit_depth >= 10 else \
                ((int(TC_TABLE[idx_tc]) + (1 << (9 - bit_depth)))
                 >> (10 - bit_depth))

            def cline(i):
                if hor:
                    return _Line(plane, xc + i, yc, True)
                return _Line(plane, xc, yc + i, False)

            use_long = False
            if large_boundary:
                idx_b = min(max(qp_c_ed, 0), MAX_QP)
                beta = int(BETA_TABLE[idx_b]) * bdscale
                c0 = cline(0)
                c1 = cline(1)      # subsampling shift 1 -> second line
                dp0 = _calc_dp(c0, chroma_hor_ctb)
                dq0 = _calc_dq(c0)
                dp3 = _calc_dp(c1, chroma_hor_ctb)
                dq3 = _calc_dq(c1)
                d0, d3 = dp0 + dq0, dp3 + dq3
                if d0 + d3 < beta:
                    use_long = True
                    sw = _use_strong(c0, 2 * d0, beta, tc, False, False,
                                     7, 7, chroma_hor_ctb) and \
                        _use_strong(c1, 2 * d3, beta, tc, False, False,
                                    7, 7, chroma_hor_ctb)
                    for step in range(loop_len):
                        _pel_filter_chroma(cline(step), tc, sw, clip_hi,
                                           large_boundary, chroma_hor_ctb)
            if not use_long:
                for step in range(loop_len):
                    _pel_filter_chroma(cline(step), tc, False, clip_hi,
                                       large_boundary, chroma_hor_ctb)
