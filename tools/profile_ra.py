#!/usr/bin/env python
"""Profile the warm RA encode path: encode once to warm jit caches,
then cProfile a second encode and print top cumulative costs."""
import cProfile
import os
import pstats
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.ctc import rich_clip, run_ours  # noqa: E402


def main():
    n = int(os.environ.get("PROF_N", "17"))
    qp = int(os.environ.get("PROF_QP", "32"))
    frames = rich_clip(416, 240, n)
    t0 = time.perf_counter()
    bits, recs, dt = run_ours(frames, 416, 240, qp, gop_size=32,
                              intra_period=32)
    print(f"cold: {dt:.1f}s ({n / dt:.3f} fps), bits {bits}")
    pr = cProfile.Profile()
    pr.enable()
    bits, recs, dt = run_ours(frames, 416, 240, qp, gop_size=32,
                              intra_period=32)
    pr.disable()
    print(f"warm: {dt:.1f}s ({n / dt:.3f} fps), bits {bits}")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(45)


if __name__ == "__main__":
    main()
