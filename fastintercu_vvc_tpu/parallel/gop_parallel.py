"""GOP/segment-parallel encoding — temporal scale-out.

The reference scales the CTC batch across sequences/GOPs with one
shell script per sequence chained over GPUs
(script_128/BasketballDrill_enc_50.sh, python/enc_script.py; SURVEY
§2.6 "GOP/sequence parallel"). The TPU-native equivalent: an RA
stream with IntraPeriod P is a chain of CLOSED segments, each starting
at an IDR and referencing nothing before it, so N workers encode N
segments concurrently and the bitstreams concatenate into one legal
stream (each segment restarts POC at its IDR; parameter sets are
emitted once). Within a host the workers overlap host-side work
(partition walk, commit pass, entropy coding) while sharing the
device; across hosts each worker owns its chips — the same split the
reference gets from per-sequence scripts, with bit-identical output
either way.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from ..codec import gop


def split_segments(n_frames: int, intra_period: int):
    """[(start, stop)] closed segments, each `intra_period` frames
    (the last may be shorter). Segment boundaries are IDR points."""
    if intra_period <= 0:
        return [(0, n_frames)]
    out = []
    s = 0
    while s < n_frames:
        out.append((s, min(s + intra_period, n_frames)))
        s += intra_period
    return out


def _encode_segment(frames, cfg, qp, gop_size, enc_kwargs):
    enc = gop.RandomAccessEncoder(cfg, gop_size=gop_size,
                                  intra_period=0, **enc_kwargs)
    t0 = time.perf_counter()
    res = enc.encode(list(frames), qp=qp)
    return res, time.perf_counter() - t0


def encode_gop_parallel(frames, cfg, qp: int, gop_size: int,
                        intra_period: int, workers: int = 1,
                        **enc_kwargs):
    """Encode `frames` as independent closed segments on a worker
    pool.

    -> (bitstream bytes, SequenceResult-per-segment list,
        {"wall_s", "worker_s", "efficiency"}) where efficiency =
    (sum of per-segment encode times) / (workers * wall) — the
    multi-host scaling estimate for this clip.
    """
    segs = split_segments(len(frames), intra_period)
    t0 = time.perf_counter()
    if workers <= 1:
        results = [_encode_segment(frames[a:b], cfg, qp, gop_size,
                                   enc_kwargs) for (a, b) in segs]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = [pool.submit(_encode_segment, frames[a:b], cfg, qp,
                                gop_size, enc_kwargs)
                    for (a, b) in segs]
            results = [f.result() for f in futs]
    wall = time.perf_counter() - t0
    worker_s = sum(dt for (_, dt) in results)
    # stitch: parameter sets (SPS 15 / PPS 16, also VPS 14 / APS 17/18
    # if ever emitted) from the first segment only, then slice data —
    # stripped by NAL type, not by fixed count (ADVICE r4 #4)
    def is_param_set(nal):
        t = (nal[1] >> 3) & 0x1F
        return t in (14, 15, 16, 17, 18)

    nals = []
    for i, (res, _) in enumerate(results):
        seg_nals = gop.split_nals(res.bitstream)
        if i == 0:
            nals.extend(seg_nals)
        else:
            k = 0
            while k < len(seg_nals) and is_param_set(seg_nals[k]):
                k += 1
            nals.extend(seg_nals[k:])
    from ..utils.bitstream import annexb
    # honest scaling estimate: unclamped (a >1.0 reading means the legs
    # were not equally warmed — the caller must warm both first)
    eff = worker_s / (max(workers, 1) * wall) if wall > 0 else 0.0
    return annexb(nals), [r for (r, _) in results], {
        "wall_s": wall, "worker_s": worker_s,
        "efficiency": eff, "segments": len(segs)}
