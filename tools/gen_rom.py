#!/usr/bin/env python
"""Generate normative VVC ROM tables into fastintercu_vvc_tpu/ops/data/.

The transform cores (DCT-II / DCT-VIII / DST-VII, 6-bit "low precision"
variants used by VTM's default build) are normative integer constants of
ISO/IEC 23090-3 §8.7.4 ("Transformation process for scaled transform
coefficients", tables of trans. coefficients). They are fully determined by
the per-size quantized base coefficient lists below plus the analytic
cosine/sine structure of the transforms; we expand them analytically.

As a hard cross-check, this script ALSO expands the butterfly macro text in
the reference checkout (/root/reference/.../RomTr.cpp, same normative
constants) and asserts bit-equality before writing anything. The committed
artifact is the .npz, not reference code.

Run:  python tools/gen_rom.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "fastintercu_vvc_tpu", "ops", "data")
REF_ROMTR = "/root/reference/vtm-mlt-cpp/source/Lib/CommonLib/RomTr.cpp"

# ---------------------------------------------------------------------------
# Normative quantized base coefficients (6-bit scale), ISO/IEC 23090-3.
# DCT2: quantized |cos((2i+1)*pi/(2N))| for the odd rows introduced at size N.
DCT2_BASE = {
    1: [64],                       # DC row (all sizes)
    2: [64],                       # cos(pi/4)
    4: [83, 36],
    8: [89, 75, 50, 18],
    16: [90, 87, 80, 70, 57, 43, 25, 9],
    32: [90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4],
    64: [91, 90, 90, 90, 88, 87, 86, 84, 83, 81, 79, 77, 73, 71, 69, 65,
         62, 59, 56, 52, 48, 44, 41, 37, 33, 28, 24, 20, 15, 11, 7, 2],
}

# DCT8 size N: quantized cos((2j+1)*pi/(2*(2N+1))) for j = 0..N-1.
DCT8_BASE = {
    4: [84, 74, 55, 29],
    8: [86, 85, 78, 71, 60, 46, 32, 17],
    16: [88, 88, 87, 85, 81, 77, 73, 68, 62, 55, 48, 40, 33, 25, 17, 8],
    32: [90, 90, 89, 88, 87, 86, 85, 84, 82, 80, 78, 77, 74, 72, 68, 66,
         63, 60, 56, 53, 50, 46, 42, 38, 34, 30, 26, 21, 17, 13, 9, 4],
}

# DST7 size N: quantized sin(j*pi/(2N+1)) for j = 1..N (same prototype set
# as DCT8 reversed).
DST7_BASE = {n: list(reversed(v)) for n, v in DCT8_BASE.items()}


def dct2_matrix(N: int) -> np.ndarray:
    """N-point VVC DCT-II core from the quantized base lists.

    Entry [k][n] has the sign of cos(pi*k*(2n+1)/(2N)) and the magnitude of
    the quantized prototype for the reduced odd angle at level N' = N>>t,
    where k = 2^t * r with r odd (the classic even/odd butterfly recursion).
    """
    M = np.zeros((N, N), np.int64)
    for k in range(N):
        for n in range(N):
            if k == 0:
                M[k][n] = DCT2_BASE[1][0]
                continue
            t = (k & -k).bit_length() - 1
            r = k >> t
            Np = N >> t
            m = (r * (2 * n + 1)) % (4 * Np)
            if m > 2 * Np:
                m = 4 * Np - m
            sign = 1 if m < Np else -1
            mm = m if m <= Np else 2 * Np - m
            if Np == 2:
                val = DCT2_BASE[2][0]  # mm == 1
            else:
                val = DCT2_BASE[Np][(mm - 1) // 2]
            M[k][n] = sign * val
    return M


def dct8_matrix(N: int) -> np.ndarray:
    """N-point VVC DCT-VIII core: entry [k][n] ~ cos((2k+1)(2n+1)pi/(4N+2))."""
    M = np.zeros((N, N), np.int64)
    D = 2 * N + 1
    for k in range(N):
        for n in range(N):
            m = ((2 * k + 1) * (2 * n + 1)) % (4 * D)
            if m > 2 * D:
                m = 4 * D - m
            sign = 1 if m < D else -1
            mm = m if m <= D else 2 * D - m
            if mm == D:
                M[k][n] = 0
            else:
                M[k][n] = sign * DCT8_BASE[N][(mm - 1) // 2]
    return M


def dst7_matrix(N: int) -> np.ndarray:
    """N-point VVC DST-VII core: entry [k][n] ~ sin((2k+1)(n+1)pi/(2N+1))."""
    M = np.zeros((N, N), np.int64)
    D = 2 * N + 1
    for k in range(N):
        for n in range(N):
            m = ((2 * k + 1) * (n + 1)) % (2 * D)
            sign = 1
            if m > D:
                sign = -1
                m = 2 * D - m  # sin(pi*m/D) antisymmetric about m=D
            # m in [0, D]; sin symmetric about D/2: sin(m pi / D)
            mm = min(m, D - m)
            if mm == 0:
                M[k][n] = 0
            else:
                M[k][n] = sign * DST7_BASE[N][mm - 1]
    return M


# ---------------------------------------------------------------------------
# Cross-check: expand the butterfly macros in the reference text and compare.

def _parse_macro_bodies(text: str):
    """Extract DEFINE_*_MATRIX macro bodies as list-of-rows of ±letter."""
    bodies = {}
    lines = text.split("\n")
    i = 0
    while i < len(lines):
        m = re.match(r"#define (DEFINE_\w+_MATRIX)\(([^)]*)\)", lines[i])
        if not m:
            i += 1
            continue
        name, args = m.group(1), m.group(2)
        argnames = [a.strip() for a in args.split(",")]
        body_lines = []
        while lines[i].rstrip().endswith("\\"):
            i += 1
            body_lines.append(lines[i].rstrip().rstrip("\\"))
        body = "\n".join(body_lines)
        rows = re.findall(r"\{([^{}]*)\}", body)
        parsed_rows = []
        for row in rows:
            entries = [e.strip() for e in row.split(",") if e.strip()]
            parsed_rows.append(entries)
        bodies[name] = (argnames, parsed_rows)
    return bodies


def _expand(bodies, name, values):
    argnames, rows = bodies[name]
    env = dict(zip(argnames, values))
    out = []
    for row in rows:
        orow = []
        for e in row:
            neg = e.startswith("-")
            tok = e.lstrip("-").strip()
            v = 0 if tok == "0" else env[tok]
            orow.append(-v if neg else v)
        out.append(orow)
    return np.asarray(out, np.int64)


def _reference_tables():
    with open(REF_ROMTR) as f:
        text = f.read()
    bodies = _parse_macro_bodies(text)
    # collect the low-precision (6-bit) invocations: the ones whose first
    # value is 64 (DCT2) or matches the 6-bit lists (DCT8/DST7)
    tables = {}
    for m in re.finditer(r"(DEFINE_(DCT2|DCT8|DST7)_P(\d+)_MATRIX)\s*\(([^)]*)\)",
                         text):
        name, kind, size, args = m.group(1), m.group(2), int(m.group(3)), m.group(4)
        try:
            vals = [int(a) for a in args.replace("\n", " ").split(",")]
        except ValueError:
            continue  # the #define line itself (letter args), not an invocation
        if max(vals) > 128:   # high-precision variant; skip
            continue
        tables[(kind, size)] = _expand(bodies, name, vals)
    return tables


# ---------------------------------------------------------------------------
# Scan orders (ISO/IEC 23090-3 §6.5.2 up-right diagonal scan), group scans.

# Coefficient-group (sub-block) log2 sizes per (log2w, log2h)
# (normative; VTM g_log2SbbSize Rom.cpp:267-279).
LOG2_SBB_SIZE = [
    [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 4), (0, 4), (0, 4)],
    [(1, 0), (1, 1), (1, 1), (1, 3), (1, 3), (1, 3), (1, 3), (1, 3)],
    [(2, 0), (1, 1), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2)],
    [(3, 0), (3, 1), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2)],
    [(4, 0), (3, 1), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2)],
    [(4, 0), (3, 1), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2)],
    [(4, 0), (3, 1), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2)],
    [(4, 0), (3, 1), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2), (2, 2)],
]


def diag_positions(w, h):
    """Plain up-right diagonal scan positions (from bottom-left of each
    anti-diagonal towards top-right)."""
    pos = []
    for d in range(w + h - 1):
        for y in range(min(d, h - 1), -1, -1):
            x = d - y
            if x < w:
                pos.append((x, y))
    return pos


def diag_scan(blk_w: int, blk_h: int) -> np.ndarray:
    """Grouped up-right diagonal scan order (CG-grouped): CGs visited
    diagonally, positions inside each CG diagonally. CG geometry follows
    the normative sub-block size table. Returns [num][2] (x, y).

    Matches VTM g_scanOrder[SCAN_GROUPED_4x4][SCAN_DIAG] (Rom.cpp
    initROM / ScanGenerator; spec §6.5.2).
    """
    lw, lh = blk_w.bit_length() - 1, blk_h.bit_length() - 1
    lgw, lgh = LOG2_SBB_SIZE[lw][lh]
    gw, gh = 1 << lgw, 1 << lgh
    # the grouped scan covers only the zero-out region for >32 dims
    # (Rom.cpp:342-343 widthInGroups/heightInGroups min'd with the
    # JVET_C0024 threshold; positions beyond are filler in VTM)
    ngx, ngy = min(32, blk_w) // gw, min(32, blk_h) // gh
    order = []
    for (gx, gy) in diag_positions(ngx, ngy):
        for (x, y) in diag_positions(gw, gh):
            order.append((gx * gw + x, gy * gh + y))
    return np.asarray(order, np.int32)


# ---------------------------------------------------------------------------
# Quantization scales (ISO/IEC 23090-3 §8.7.3: levelScale) — normative.
# Row 0: standard; row 1: sqrt(2)-adjusted for odd log2(w)+log2(h) blocks
# (VTM g_quantScales / g_invQuantScales, Rom.cpp:478-488).
QUANT_SCALES = np.asarray(
    [[26214, 23302, 20560, 18396, 16384, 14564],
     [18396, 16384, 14564, 13107, 11651, 10280]], np.int32)
INV_QUANT_SCALES = np.asarray(
    [[40, 45, 51, 57, 64, 72],
     [57, 64, 72, 80, 90, 102]], np.int32)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)

    gen = {}
    for N in (2, 4, 8, 16, 32, 64):
        gen[("DCT2", N)] = dct2_matrix(N)
    for N in (4, 8, 16, 32):
        gen[("DCT8", N)] = dct8_matrix(N)
        gen[("DST7", N)] = dst7_matrix(N)

    # Cross-check against the normative tables in the reference checkout.
    if os.path.exists(REF_ROMTR):
        ref = _reference_tables()
        for key, mat in gen.items():
            if key in ref:
                assert np.array_equal(mat, ref[key]), f"mismatch for {key}"
        print(f"cross-checked {len([k for k in gen if k in ref])} matrices "
              "against normative reference tables: OK")
    else:
        print("WARNING: reference not present; skipping cross-check")

    arrays = {f"{kind}_{N}": mat.astype(np.int32)
              for (kind, N), mat in gen.items()}

    # scan orders for all block shapes 1x1..64x64 used by residual coding:
    # grouped (coefficient scan) and ungrouped (CG scan over group grids)
    for lw in range(7):
        for lh in range(7):
            w, h = 1 << lw, 1 << lh
            arrays[f"SCAN_DIAG_{w}x{h}"] = diag_scan(w, h)
            arrays[f"SCAN_DIAG_UNGROUPED_{w}x{h}"] = np.asarray(
                diag_positions(w, h), np.int32).reshape(-1, 2)
    arrays["LOG2_SBB_SIZE"] = np.asarray(LOG2_SBB_SIZE, np.int32)

    arrays["QUANT_SCALES"] = QUANT_SCALES
    arrays["INV_QUANT_SCALES"] = INV_QUANT_SCALES

    out = os.path.join(OUT_DIR, "rom.npz")
    np.savez_compressed(out, **arrays)
    print(f"wrote {out} ({len(arrays)} tables)")


if __name__ == "__main__":
    sys.exit(main())
