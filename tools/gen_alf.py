#!/usr/bin/env python
"""Extract the normative ALF fixed-filter tables (VVC spec Tables
 8-17/8-18: AlfFixFiltCoeff and AlfClassToFiltMap) from the reference
tree into ops/data/alf.npz — the same generator methodology as
tools/gen_ctx.py (normative constants are transcribed from the spec
via the reference's declaration, not hand-retyped).

Source: vtm-mlt-cpp/source/Lib/CommonLib/AdaptiveLoopFilter.cpp:212
(m_fixedFilterSetCoeff, 64 filters x 13 coeffs — the 13th/DC slot is
unused by the filtering path) and :280 (m_classToFilterMapping,
16 sets x 25 classes).
"""

import os
import re

import numpy as np

REF = "/root/reference/vtm-mlt-cpp/source/Lib/CommonLib/AdaptiveLoopFilter.cpp"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fastintercu_vvc_tpu", "ops", "data", "alf.npz")


def parse_table(src: str, decl: str, rows: int, cols: int) -> np.ndarray:
    i = src.index(decl)
    j = src.index("};", i)
    body = src[i:j]
    nums = re.findall(r"-?\d+", body[body.index("{"):])
    vals = [int(n) for n in nums]
    assert len(vals) == rows * cols, (decl, len(vals))
    return np.asarray(vals, np.int32).reshape(rows, cols)


def main():
    src = open(REF).read()
    fixed = parse_table(src, "m_fixedFilterSetCoeff[ALF_FIXED_FILTER_NUM]",
                        64, 13)
    mapping = parse_table(src,
                          "m_classToFilterMapping[NUM_FIXED_FILTER_SETS]",
                          16, 25)
    assert mapping.min() >= 0 and mapping.max() < 64
    np.savez_compressed(OUT, fixed_filters=fixed[:, :12],
                        class_to_filter=mapping)
    print(f"wrote {OUT}: fixed_filters {fixed[:, :12].shape}, "
          f"class_to_filter {mapping.shape}")


if __name__ == "__main__":
    main()
