"""YUV file I/O (planar 4:2:0 / 4:0:0, 8- or 10-bit little-endian).

Capability parity: Lib/Utilities/VideoIOYuv.cpp (read :892, write :991)
without the colourspace conversions (those land with the chroma path).
"""

from __future__ import annotations

import numpy as np


def frame_size_bytes(w: int, h: int, bit_depth: int, chroma420: bool) -> int:
    per = 2 if bit_depth > 8 else 1
    luma = w * h * per
    return luma + (luma // 2 if chroma420 else 0)


def read_frames(path: str, w: int, h: int, bit_depth: int = 10,
                chroma420: bool = True, max_frames: int | None = None):
    """Yield (y, u, v) numpy planes (u/v None for 4:0:0)."""
    dtype = np.dtype("<u2") if bit_depth > 8 else np.uint8
    ysize = w * h
    csize = (w // 2) * (h // 2) if chroma420 else 0
    per_frame = ysize + 2 * csize
    with open(path, "rb") as f:
        n = 0
        while max_frames is None or n < max_frames:
            raw = np.fromfile(f, dtype=dtype, count=per_frame)
            if raw.size < per_frame:
                return
            y = raw[:ysize].reshape(h, w).astype(np.int32)
            if chroma420:
                u = raw[ysize:ysize + csize].reshape(h // 2, w // 2).astype(np.int32)
                v = raw[ysize + csize:].reshape(h // 2, w // 2).astype(np.int32)
            else:
                u = v = None
            yield y, u, v
            n += 1


def write_frames(path: str, frames, bit_depth: int = 10):
    """frames: iterable of (y, u, v) planes (u/v may be None)."""
    dtype = np.dtype("<u2") if bit_depth > 8 else np.uint8
    with open(path, "wb") as f:
        for y, u, v in frames:
            y.astype(dtype).tofile(f)
            if u is not None:
                u.astype(dtype).tofile(f)
                v.astype(dtype).tofile(f)
