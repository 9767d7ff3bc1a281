#!/usr/bin/env python
"""Extract the normative MIP weight matrices (VVC spec §8.4.5.2.3
Tables 23-25) from the reference tree into ops/data/mip.npz — same
generator methodology as tools/gen_ctx.py / gen_alf.py (normative
constants transcribed via the reference's declaration, not retyped).

Source: vtm-mlt-cpp/source/Lib/CommonLib/MipData.h —
mipMatrix4x4[16][16][4], mipMatrix8x8[8][16][8],
mipMatrix16x16[6][64][7] (uint8 weights, MIP_SHIFT_MATRIX 6,
MIP_OFFSET_MATRIX 32).
"""

import os
import re

import numpy as np

REF = "/root/reference/vtm-mlt-cpp/source/Lib/CommonLib/MipData.h"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fastintercu_vvc_tpu", "ops", "data", "mip.npz")


def extract(src: str, name: str, shape):
    m = re.search(re.escape(name) + r"\[\d+\]\[\d+\]\[\d+\]\)\s*=",
                  src)
    assert m, name
    depth = 0
    start = src.index("{", m.end())
    i = start
    while True:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    nums = [int(v) for v in re.findall(r"-?\d+", src[start:i + 1])]
    arr = np.asarray(nums, np.uint8).reshape(shape)
    return arr


def main():
    src = open(REF).read()
    m4 = extract(src, "mipMatrix4x4", (16, 16, 4))
    m8 = extract(src, "mipMatrix8x8", (8, 16, 8))
    m16 = extract(src, "mipMatrix16x16", (6, 64, 7))
    np.savez_compressed(OUT, m4=m4, m8=m8, m16=m16)
    print(f"wrote {OUT}: m4 {m4.shape} m8 {m8.shape} m16 {m16.shape}")
    print("spot:", m4[0, 0].tolist(), m16[5, 63].tolist())


if __name__ == "__main__":
    main()
