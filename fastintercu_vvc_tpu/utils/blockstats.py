"""Block-statistics export (YUView-compatible text format).

Reference parity: VTM's K0149 block statistics
(CommonLib/dtrace_blockstatistics.cpp, enabled by K0149_BLOCK_STATISTICS
TypeDef.h:134) dumps per-block mode/MV/flag maps as "BlockStat:" trace
lines that the YUView analyzer overlays on the decoded video. The
encoder here keeps the whole frame's CU state as SoA per-4x4 maps
(codec.encoder maps), so the dump is a vectorized scan for CU origins —
no per-block callbacks.

Line format (dtrace_blockstatistics.cpp writeBlockStat*):
    BlockStat: POC n @( x, y) [ wx h] Name=value
    BlockStat: POC n @( x, y) [ wx h] Name={ mvx, mvy}
"""

from __future__ import annotations

import numpy as np

HEADER = """# VTM Block Statistics
# Sequence size: [{w}x{h}]
# Block Statistic Type: PredMode; Flag;
# Block Statistic Type: SkipFlag; Flag;
# Block Statistic Type: QT_Depth; Integer; [0, 6]
# Block Statistic Type: IntraMode_Luma; Integer; [0, 66]
# Block Statistic Type: MIPFlag; Flag;
# Block Statistic Type: ISPFlag; Flag;
# Block Statistic Type: AffineFlag; Flag;
# Block Statistic Type: CIIPFlag; Flag;
# Block Statistic Type: InterDir; Integer; [1, 3]
# Block Statistic Type: MVL0; Vector; Scale: 16
# Block Statistic Type: MVL1; Vector; Scale: 16
# Block Statistic Type: RefIdxL0; Integer; [0, 15]
# Block Statistic Type: RefIdxL1; Integer; [0, 15]
# Block Statistic Type: QP; Integer; [0, 63]
# Block Statistic Type: Y_CBF; Flag;
"""


def cu_records(maps) -> list[dict]:
    """Extract one record per coded CU from the per-4x4 SoA maps
    (a grid cell is a CU origin iff its cu_x0/cu_y0 point at itself)."""
    gy, gx = np.mgrid[0:maps.gh, 0:maps.gw]
    origin = (maps.coded & (maps.cu_x0 == gx * 4)
              & (maps.cu_y0 == gy * 4))
    ys, xs = np.nonzero(origin)
    recs = []
    for j, i in zip(ys.tolist(), xs.tolist()):
        r = {"x": int(i * 4), "y": int(j * 4),
             "w": int(maps.cu_w[j, i]), "h": int(maps.cu_h[j, i]),
             "intra": int(maps.mode[j, i]) >= 0,
             "mode": int(maps.mode[j, i]),
             "skip": bool(maps.skip[j, i]),
             "qt_d": int(maps.qt_d[j, i]),
             "inter_dir": int(maps.inter_dir[j, i]),
             # component 0 is horizontal everywhere in this codebase
             # (ops/inter.py MV convention); the writer prints
             # {mvx, mvy} like dtrace_blockstatistics.cpp:624
             "mv0": (int(maps.mv0[j, i, 0]), int(maps.mv0[j, i, 1])),
             "mv1": (int(maps.mv1[j, i, 0]), int(maps.mv1[j, i, 1])),
             "ref0": int(maps.ref0[j, i]), "ref1": int(maps.ref1[j, i]),
             "qp": int(maps.qp[j, i]),
             "cbf_y": bool(maps.cbf_y[j, i]),
             "mip": bool(maps.mip[j, i]),
             "isp": bool(maps.isp[j, i]),
             "affine": bool(maps.affine[j, i]),
             "ciip": bool(maps.ciip[j, i])}
        recs.append(r)
    return recs


def dump_frame(maps, poc: int) -> str:
    """-> BlockStat lines for one frame (no header)."""
    out = []
    a = out.append
    for r in cu_records(maps):
        at = f"BlockStat: POC {poc} @({r['x']:4},{r['y']:4}) " \
             f"[{r['w']:4}x{r['h']:4}] "
        a(at + f"PredMode={0 if r['intra'] else 1}")
        a(at + f"QT_Depth={r['qt_d']}")
        a(at + f"QP={r['qp']}")
        a(at + f"Y_CBF={1 if r['cbf_y'] else 0}")
        if r["intra"]:
            a(at + f"IntraMode_Luma={r['mode']}")
            if r["mip"]:
                a(at + "MIPFlag=1")
            if r["isp"]:
                a(at + "ISPFlag=1")
        else:
            a(at + f"SkipFlag={1 if r['skip'] else 0}")
            a(at + f"InterDir={r['inter_dir']}")
            if r["affine"]:
                a(at + "AffineFlag=1")
            if r["ciip"]:
                a(at + "CIIPFlag=1")
            if r["inter_dir"] & 1:
                a(at + "MVL0={%4d,%4d}" % r["mv0"])
                a(at + f"RefIdxL0={r['ref0']}")
            if r["inter_dir"] & 2:
                a(at + "MVL1={%4d,%4d}" % r["mv1"])
                a(at + f"RefIdxL1={r['ref1']}")
    return "\n".join(out)


def dump_sequence(path: str, frames_maps, w: int, h: int):
    """Write a full YUView statistics file: frames_maps is an iterable
    of (poc, maps)."""
    with open(path, "w") as f:
        f.write(HEADER.format(w=w, h=h))
        for poc, maps in frames_maps:
            f.write(dump_frame(maps, poc))
            f.write("\n")
