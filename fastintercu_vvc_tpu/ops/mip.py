"""MIP (matrix-based intra prediction) — normative, spec §8.4.5.2.1-3.

Behavioral parity: vtm-mlt-cpp/source/Lib/CommonLib/
MatrixIntraPrediction.cpp — prepareInputForPred (Haar boundary
downsampling + rebase), computeReducedPred (uint8 matrix multiply,
MIP_SHIFT_MATRIX 6 / MIP_OFFSET_MATRIX 32, sizeId-2 first-column
elision), predictionUpsampling (horizontal from the left reference,
then vertical from the top reference); UnitTools.cpp getMipSizeId /
getNumModesMip.

Weight matrices from ops/data/mip.npz (tools/gen_mip.py)."""

from __future__ import annotations

import functools
import os

import numpy as np

MIP_SHIFT = 6
MIP_OFFSET = 32


@functools.lru_cache(maxsize=1)
def _matrices():
    d = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "mip.npz"))
    return (d["m4"].astype(np.int32), d["m8"].astype(np.int32),
            d["m16"].astype(np.int32))


def size_id(w: int, h: int) -> int:
    if w == 4 and h == 4:
        return 0
    if w == 4 or h == 4 or (w == 8 and h == 8):
        return 1
    return 2


def num_modes(w: int, h: int) -> int:
    return (16, 8, 6)[size_id(w, h)]


def mip_allowed(w: int, h: int) -> bool:
    """Encoder-side gate (MIP_MAX_WIDTH/HEIGHT 64)."""
    return w <= 64 and h <= 64


def _downsample(full: np.ndarray, dst_len: int) -> np.ndarray:
    src_len = len(full)
    if dst_len >= src_len:
        return full[:dst_len].astype(np.int64)
    f = src_len // dst_len
    lg = f.bit_length() - 1
    return ((full.reshape(dst_len, f).sum(axis=1) + (1 << (lg - 1)))
            >> lg)


def _upsample_1d(src, bndry_first, ups):
    """predictionUpsampling1D along axis=-1: src [..., n] plus the
    'before' boundary column [...] -> [..., n*ups]."""
    lg = ups.bit_length() - 1
    off = 1 << (lg - 1)
    before = np.concatenate([bndry_first[..., None], src[..., :-1]],
                            axis=-1).astype(np.int64)   # [..., n]
    behind = src.astype(np.int64)
    ks = np.arange(1, ups + 1)
    # out[..., i, k-1] = ((ups-k)*before + k*behind + off) >> lg
    out = (((ups - ks)[None, :] * before[..., None]
            + ks[None, :] * behind[..., None] + off) >> lg)
    return out.reshape(*src.shape[:-1], src.shape[-1] * ups)


def predict(top: np.ndarray, left: np.ndarray, w: int, h: int,
            mode_idx: int, transposed: bool,
            bit_depth: int = 10) -> np.ndarray:
    """MIP prediction for one block. top/left are the UNFILTERED
    reference arrays from intra.build_refs* (top[0] = corner;
    top[1..w] / left[1..h] used)."""
    sid = size_id(w, h)
    red_bdry = 2 if sid == 0 else 4
    red_pred = 4 if sid < 2 else 8
    ref_top = np.asarray(top[1:w + 1], np.int64)
    ref_left = np.asarray(left[1:h + 1], np.int64)

    top_red = _downsample(ref_top, red_bdry)
    left_red = _downsample(ref_left, red_bdry)
    if transposed:
        inp = np.concatenate([left_red, top_red])
    else:
        inp = np.concatenate([top_red, left_red])
    input_offset = int(inp[0])
    inp = inp - input_offset
    if sid < 2:
        inp[0] = (1 << (bit_depth - 1)) - input_offset

    mat = _matrices()[sid][mode_idx]          # [redH*redW, in_cols]
    input_size = 2 * red_bdry
    offset = (1 << (MIP_SHIFT - 1)) - MIP_OFFSET * int(inp.sum())
    if sid == 2:
        # first matrix column elided (weight pointer walks back one
        # per output; input[0] term is zero)
        acc = mat @ inp[1:] + offset
    else:
        acc = mat @ inp + offset
    red = (acc >> MIP_SHIFT) + input_offset
    red = np.clip(red, 0, (1 << bit_depth) - 1) \
        .reshape(red_pred, red_pred)
    if transposed:
        red = red.T

    ups_h = w // red_pred
    ups_v = h // red_pred
    out = red
    if ups_h > 1:
        # horizontal upsampling from the left reference column
        # (decimated to the reduced rows)
        bndry = ref_left[ups_v - 1::ups_v]     # [red_pred]
        out = _upsample_1d(out, bndry, ups_h)  # [red_pred, w]
    if ups_v > 1:
        # vertical upsampling from the (full) top reference row
        out = _upsample_1d(out.T, ref_top, ups_v).T
    return out.astype(np.int32)
