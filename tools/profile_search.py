#!/usr/bin/env python
"""Stage-level device timing of the whole-frame search at the bench
geometry (416x240 -> 512x256 padded, CTU 128, sr 16, B-frame)."""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
import jax
import jax.numpy as jnp

from fastintercu_vvc_tpu.codec import fused_search, hls, contexts, bitest
from fastintercu_vvc_tpu.ops import me_frame


def tfetch(fn, *a, n=5, **k):
    """Time fn(*a) with a result fetch (the tunnel's block_until_ready
    does not synchronize)."""
    outs = fn(*a, **k)
    leaf = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(leaf)                      # warm
    t0 = time.perf_counter()
    for _ in range(n):
        outs = fn(*a, **k)
        for lf in jax.tree_util.tree_leaves(outs):
            np.asarray(lf)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    H, W = 256, 512
    org = rng.randint(0, 1024, (H, W)).astype(np.int32)
    r0 = rng.randint(0, 1024, (H, W)).astype(np.int32)
    r1 = rng.randint(0, 1024, (H, W)).astype(np.int32)
    sr = 16
    jorg = jnp.asarray(org)
    refs0 = jnp.asarray(r0)[None]
    refs1 = jnp.asarray(r1)[None]
    h8, w8 = H // 8, W // 8
    cf0 = jnp.zeros((1, h8, w8, 2), jnp.int32)
    cv0 = jnp.zeros((1, h8, w8), bool)

    cfg = hls.SeqConfig(width=W, height=H, chroma_format=hls.CHROMA_420,
                        ctu_size=128, min_qt_intra=8, min_qt_inter=8,
                        log2_min_cu=3, max_mtt_depth_intra=3,
                        max_mtt_depth_inter=3, max_bt_inter=64,
                        max_tt_inter=64)
    pc = fused_search._pc_for(cfg, hls.B_SLICE)
    squares, geoms = fused_search._geometries(pc, 128, pc.min_qt, 3)
    intra_classes = tuple(c for c in geoms if c[0] <= 64 and c[1] <= 64)
    iclasses = tuple(g for g in geoms if g[0] >= 8 and g[1] >= 8)
    print(f"{len(geoms)} classes, {len(iclasses)} inter, "
          f"{len(intra_classes)} intra")

    t = tfetch(fused_search._search_device_all, jorg, refs0, refs1,
               cf0, cv0, cf0, cv0, 100.0, 3.0, 6.0, 100.0,
               intra_classes=intra_classes, iclasses=iclasses,
               sr=sr, bd=10, n0=1, n1=1)
    print(f"full B program: {t*1e3:.1f} ms")

    t = tfetch(fused_search._search_device_all, jorg, refs0, refs1,
               cf0, cv0, cf0, cv0, 100.0, 3.0, 6.0, 100.0,
               intra_classes=intra_classes, iclasses=(),
               sr=sr, bd=10, n0=0, n1=0)
    print(f"intra-only program: {t*1e3:.1f} ms")

    sm = jax.jit(lambda o, r: me_frame.sad_map(o, r, sr))
    t = tfetch(sm, jorg, refs0[0])
    print(f"sad_map: {t*1e3:.1f} ms")

    cb = jax.jit(lambda o, r: me_frame._coarse_best(o, [r], sr))
    t = tfetch(cb, jorg, refs0[0])
    print(f"coarse_best: {t*1e3:.1f} ms")

    # per-class leg timings
    pads0 = jnp.pad(refs0[0], me_frame.PAD, mode="edge"
                    ).astype(jnp.int16)[None]
    s8 = sm(jorg, refs0[0])[None]
    ii = me_frame._integral(s8)
    c0 = np.asarray(cb(jorg, refs0[0]))
    c0j = jnp.asarray(c0)
    tot = 0.0
    for (w, h) in iclasses:
        t = tfetch(me_frame._class_device, jorg, pads0, pads0, ii, ii,
                   c0j, c0j, cf0, cv0, cf0, cv0, 100.0, w, h, sr, 10,
                   1, 1, n=3)
        tot += t
        print(f"  class {w:3d}x{h:<3d}: {t*1e3:6.1f} ms")
    print(f"sum of class bodies: {tot*1e3:.1f} ms")


if __name__ == "__main__":
    main()
