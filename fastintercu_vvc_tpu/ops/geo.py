"""GEO (geometric partitioning merge mode, GPM).

Behavioral parity:
  - mode table + weight masks generated analytically (initGeoTemplate,
    Rom.cpp:716-795; g_angle2mask/g_Dis/g_angle2mirror Rom.cpp:800+)
  - uni candidate list PU::getGeoMergeCandidates (UnitTools.cpp:3285)
  - blending InterpolationFilter::xWeightedGeoBlk
    (InterpolationFilter.cpp:890: w*p0 + (8-w)*p1 in the 14-bit
    intermediate domain, shift IF_INTERNAL_FRAC_BITS+3)
  - motion-field span PU::spanGeoMotionInfo (UnitTools.cpp:3343)

The masks are closed-form (integer distance from the partition line),
NOT trained data — regenerated here from the same formulas.
"""

from __future__ import annotations

import functools

import numpy as np

from . import inter

GEO_NUM_ANGLES = 32
GEO_NUM_DISTANCES = 4
GEO_NUM_PARTITION_MODE = 64
GEO_MAX_CU_LOG2 = 6
GEO_WEIGHT_MASK_SIZE = 112
GEO_MIN_CU_LOG2 = 3
GEO_MAX_NUM_UNI_CANDS = 6

ANGLE2MASK = (0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1, 4, 3, 2, 1, -1,
              0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1, 4, 3, 2, 1, -1)
DIS = (8, 8, 8, 8, 4, 4, 2, 1, 0, -1, -2, -4, -4, -8, -8, -8,
       -8, -8, -8, -8, -4, -4, -2, -1, 0, 1, 2, 4, 4, 8, 8, 8)
ANGLE2MIRROR = (0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2)


@functools.lru_cache(maxsize=1)
def geo_params():
    """g_GeoParams: (angle, distance) per split-dir 0..63."""
    out = []
    for angle in range(GEO_NUM_ANGLES):
        for dist in range(GEO_NUM_DISTANCES):
            if dist == 0 and angle >= 16:
                continue
            if dist in (0, 2) and ANGLE2MASK[angle] in (0, 5):
                continue
            if ANGLE2MASK[angle] == -1:
                continue
            out.append((angle, dist))
    assert len(out) == GEO_NUM_PARTITION_MODE
    return tuple(out)


@functools.lru_cache(maxsize=1)
def _global_weights():
    """g_globalGeoWeights[maskIdx]: [112, 112] int arrays."""
    masks = {}
    mask_offset = (2 * (1 << GEO_MAX_CU_LOG2) - GEO_WEIGHT_MASK_SIZE) >> 1
    for angle in range((GEO_NUM_ANGLES >> 2) + 1):
        mi = ANGLE2MASK[angle]
        if mi == -1 or mi in masks:
            continue
        dist_x = angle
        dist_y = (dist_x + (GEO_NUM_ANGLES >> 2)) % GEO_NUM_ANGLES
        rho = (DIS[dist_x] << (GEO_MAX_CU_LOG2 + 1)) \
            + (DIS[dist_y] << (GEO_MAX_CU_LOG2 + 1))
        ys = ((np.arange(GEO_WEIGHT_MASK_SIZE) + mask_offset) << 1) + 1
        xs = ((np.arange(GEO_WEIGHT_MASK_SIZE) + mask_offset) << 1) + 1
        widx = xs[None, :] * DIS[dist_x] + ys[:, None] * DIS[dist_y] - rho
        masks[mi] = np.clip((32 + widx + 4) >> 3, 0, 8).astype(np.int32)
    return masks


def weight_offset(split_dir: int, w: int, h: int):
    """g_weightOffset parity (initGeoTemplate size loop)."""
    angle, dist = geo_params()[split_dir]
    off_x = (GEO_WEIGHT_MASK_SIZE - w) >> 1
    off_y = (GEO_WEIGHT_MASK_SIZE - h) >> 1
    if dist > 0:
        if angle % 16 == 8 or (angle % 16 != 0 and h >= w):
            off_y += (dist * h) >> 3 if angle < 16 else -((dist * h) >> 3)
        else:
            off_x += (dist * w) >> 3 if angle < 16 else -((dist * w) >> 3)
    return off_x, off_y


def weight_mask(split_dir: int, w: int, h: int, scale: int = 0
                ) -> np.ndarray:
    """The per-sample weight of prediction 0 (0..8) for a w x h block
    (luma: scale 0; 4:2:0 chroma: scale 1 with w/h in chroma samples) —
    xWeightedGeoBlk pointer-walk parity incl. mirroring."""
    angle, _ = geo_params()[split_dir]
    lw, lh = w << scale, h << scale
    off_x, off_y = weight_offset(split_dir, lw, lh)
    g = _global_weights()[ANGLE2MASK[angle]]
    mirror = ANGLE2MIRROR[angle]
    step = 1 << scale
    if mirror == 2:        # vertical flip
        rows = (GEO_WEIGHT_MASK_SIZE - 1 - off_y) \
            - step * np.arange(h)
        cols = off_x + step * np.arange(w)
    elif mirror == 1:      # horizontal flip
        rows = off_y + step * np.arange(h)
        cols = (GEO_WEIGHT_MASK_SIZE - 1 - off_x) \
            - step * np.arange(w)
    else:
        rows = off_y + step * np.arange(h)
        cols = off_x + step * np.arange(w)
    return g[np.ix_(rows, cols)]


def blend(p0: np.ndarray, p1: np.ndarray, wmask: np.ndarray,
          bit_depth: int = 10) -> np.ndarray:
    """xWeightedGeoBlk blend of two intermediate-domain predictions."""
    shift = (inter.IF_INTERNAL_PREC - bit_depth) + 3
    offset = (1 << (shift - 1)) + (inter.IF_INTERNAL_OFFS << 3)
    out = (wmask.astype(np.int64) * p0 + (8 - wmask).astype(np.int64)
           * p1 + offset) >> shift
    return np.clip(out, 0, (1 << bit_depth) - 1).astype(np.int32)


def geo_merge_candidates(merge_cands, max_geo: int) -> list:
    """PU::getGeoMergeCandidates: parity-alternating uni extraction
    from the regular merge list."""
    out = []
    for i, mi in enumerate(merge_cands):
        parity = i & 1
        if mi.inter_dir & (1 + parity):
            if parity == 0:
                out.append(inter.MotionInfo(1, mi.mv0, (0, 0),
                                            mi.ref0, -1))
            else:
                out.append(inter.MotionInfo(2, (0, 0), mi.mv1,
                                            -1, mi.ref1))
            if len(out) == GEO_MAX_NUM_UNI_CANDS:
                break
            continue
        if mi.inter_dir & (2 - parity):
            if parity == 0:
                out.append(inter.MotionInfo(2, (0, 0), mi.mv1,
                                            -1, mi.ref1))
            else:
                out.append(inter.MotionInfo(1, mi.mv0, (0, 0),
                                            mi.ref0, -1))
            if len(out) == GEO_MAX_NUM_UNI_CANDS:
                break
    return out[:max_geo]


def span_motion(split_dir: int, w: int, h: int, mi0, mi1):
    """PU::spanGeoMotionInfo: per-4x4 stored motion. Returns
    [h//4, w//4] array of MotionInfo."""
    if mi0.inter_dir == 1 and mi1.inter_dir == 2:
        bi = inter.MotionInfo(3, mi0.mv0, mi1.mv1, mi0.ref0, mi1.ref1)
    elif mi0.inter_dir == 2 and mi1.inter_dir == 1:
        bi = inter.MotionInfo(3, mi1.mv0, mi0.mv1, mi1.ref0, mi0.ref1)
    elif mi0.inter_dir == 1 and mi1.inter_dir == 1:
        bi = inter.MotionInfo(1, mi1.mv0, (0, 0), mi1.ref0, -1)
    else:
        bi = inter.MotionInfo(2, (0, 0), mi1.mv1, -1, mi1.ref1)

    angle, dist = geo_params()[split_dir]
    is_flip = 13 <= angle <= 27
    dist_x = angle
    dist_y = (dist_x + (GEO_NUM_ANGLES >> 2)) % GEO_NUM_ANGLES
    off_x = (-w) >> 1
    off_y = (-h) >> 1
    if dist > 0:
        if angle % 16 == 8 or (angle % 16 != 0 and h >= w):
            off_y += (dist * h) >> 3 if angle < 16 else -((dist * h) >> 3)
        else:
            off_x += (dist * w) >> 3 if angle < 16 else -((dist * w) >> 3)
    out = np.empty((h // 4, w // 4), object)
    for by in range(h // 4):
        look_y = (((4 * by + off_y) << 1) + 5) * DIS[dist_y]
        for bx in range(w // 4):
            midx = (((4 * bx + off_x) << 1) + 5) * DIS[dist_x] + look_y
            if abs(midx) < 32:
                tpm = 2
            else:
                tpm = (1 - is_flip) if midx <= 0 else is_flip
            out[by, bx] = bi if tpm == 2 else (mi0 if tpm == 0 else mi1)
    return out
