#!/usr/bin/env python
"""Extract the normative LFNST kernel matrices (VVC spec §8.7.4.3
low-frequency non-separable transform tables) into ops/data/lfnst.npz
— same generator methodology as tools/gen_ctx.py / gen_mip.py.

Source: vtm-mlt-cpp/source/Lib/CommonLib/RomLFNST.cpp —
g_lfnst8x8[4][2][16][48], g_lfnst4x4[4][2][16][16] (int8),
g_lfnstLut[95] (intra mode -> set index).
"""

import os
import re

import numpy as np

REF = "/root/reference/vtm-mlt-cpp/source/Lib/CommonLib/RomLFNST.cpp"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fastintercu_vvc_tpu", "ops", "data", "lfnst.npz")


def extract(src: str, name: str, shape, dtype):
    m = re.search(re.escape(name) + r"\s*\[[^=]*=", src)
    assert m, name
    start = src.index("{", m.end() - 1)
    depth = 0
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
    return np.asarray(nums, dtype).reshape(shape)


def main():
    src = open(REF).read()
    src = re.sub(r"//[^\n]*", "", src)      # strip comment rows
    lut = extract(src, "g_lfnstLut", (95,), np.int32)
    m8 = extract(src, "g_lfnst8x8", (4, 2, 16, 48), np.int32)
    m4 = extract(src, "g_lfnst4x4", (4, 2, 16, 16), np.int32)
    np.savez_compressed(OUT, lut=lut, m8=m8, m4=m4)
    print(f"wrote {OUT}; lut[:8]={lut[:8].tolist()} "
          f"m8[0,0,0,:4]={m8[0, 0, 0, :4].tolist()}")


if __name__ == "__main__":
    main()
