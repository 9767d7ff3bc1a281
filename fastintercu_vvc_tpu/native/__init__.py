"""Native (C) runtime components: the sequential CABAC engine.

Built on demand with the system compiler (no pip deps); loaded via
ctypes. Falls back to the pure-Python engine when compilation is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcabac.so")
_SRCS = [os.path.join(_DIR, "cabac_engine.c"),
         os.path.join(_DIR, "residual_ops.c")]

_lib = None


def _build():
    subprocess.run(["cc", "-O2", "-shared", "-fPIC", *_SRCS, "-o", _SO],
                   check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native CABAC library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or any(
                os.path.getmtime(_SO) < os.path.getmtime(s) for s in _SRCS):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.cabac_run.restype = ctypes.c_int64
        lib.cabac_run.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint32)]
        lib.residual_ops.restype = ctypes.c_int64
        lib.residual_ops.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
        _lib = lib
        return lib
    except Exception:
        return None


def residual_ops(coeff, is_chroma: int, log2_cg_w: int, log2_cg_h: int,
                 ctxb) -> np.ndarray:
    """Generate the bin-op stream for one TU component natively.
    coeff: [H, W] int array of quantized levels (>= one nonzero).
    ctxb: 15 context-base ints (see residual_ops.c)."""
    lib = get_lib()
    assert lib is not None
    c = np.ascontiguousarray(coeff, np.int32)
    h, w = c.shape
    cb = np.ascontiguousarray(ctxb, np.int32)
    cap = 4 * w * h + 256
    out = np.empty(cap, np.uint32)
    n = lib.residual_ops(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h,
        int(is_chroma), log2_cg_w, log2_cg_h,
        cb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
    if n < -2:                       # capacity miss: retry exact size
        cap = -n
        out = np.empty(cap, np.uint32)
        n = lib.residual_ops(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h,
            int(is_chroma), log2_cg_w, log2_cg_h,
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
    assert n >= 0, f"residual_ops error {n}"
    return out[:n]


def cabac_run(ops: np.ndarray, bank) -> tuple[bytes, tuple[int, int]]:
    """Execute an op stream against a codec.cabac.ContextBank (states
    updated in place). -> (payload bytes, (tail_val, tail_bits))."""
    lib = get_lib()
    assert lib is not None, "native cabac unavailable"
    ops = np.ascontiguousarray(ops, np.uint32)
    n_ctx = len(bank.state0)
    s0 = np.ascontiguousarray(bank.state0, np.uint16)
    s1 = np.ascontiguousarray(bank.state1, np.uint16)
    rate = np.ascontiguousarray(bank.rate, np.uint8)
    out = np.zeros(len(ops) // 2 + 4096, np.uint8)
    tail = np.zeros(2, np.uint32)
    n = lib.cabac_run(
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(ops),
        s0.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        s1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        rate.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_ctx,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    assert n >= 0, f"native cabac error {n}"
    bank.state0[:] = s0
    bank.state1[:] = s1
    return bytes(out[:n]), (int(tail[0]), int(tail[1]))


class OpRecorder:
    """Drop-in for codec.cabac.CabacEncoder that records ops instead of
    encoding; execute later with cabac_run. Interface subset used by the
    syntax writers. Bulk native-generated op arrays are appended with
    extend_ops (zero-copy until to_array)."""

    K_CTX, K_EP, K_EPS, K_TRM = 0 << 28, 1 << 28, 2 << 28, 3 << 28

    def __init__(self):
        self._parts: list[np.ndarray] = []
        self._cur: list[int] = []

    def encode_bin(self, bin_, ctx_id):
        self._cur.append(self.K_CTX | (ctx_id << 1) | bin_)

    def encode_bin_ep(self, bin_):
        self._cur.append(self.K_EP | bin_)

    def encode_bins_ep(self, bins, num_bins):
        # split >20-bit payloads (op format limit)
        while num_bins > 20:
            num_bins -= 20
            self._cur.append(self.K_EPS | (20 << 20)
                             | ((bins >> num_bins) & 0xFFFFF))
            bins &= (1 << num_bins) - 1
        self._cur.append(self.K_EPS | (num_bins << 20) | bins)

    def encode_bin_trm(self, bin_):
        self._cur.append(self.K_TRM | bin_)

    def extend_ops(self, arr: np.ndarray):
        if self._cur:
            self._parts.append(np.asarray(self._cur, np.uint32))
            self._cur = []
        self._parts.append(arr)

    def to_array(self) -> np.ndarray:
        parts = list(self._parts)
        if self._cur:
            parts.append(np.asarray(self._cur, np.uint32))
        if not parts:
            return np.empty(0, np.uint32)
        return np.concatenate(parts)
