"""Structured encode tracing (CDTrace/dtrace + Analyze parity)."""

import io
import json

import numpy as np

from fastintercu_vvc_tpu.codec import encoder, hls
from fastintercu_vvc_tpu.utils import trace


def test_trace_channels_and_final_decisions_only():
    buf = io.StringIO()
    trace.set_tracer(trace.Tracer(buf, channels={"frame", "cu"}))
    try:
        rng = np.random.RandomState(0)
        org = rng.randint(0, 1024, (64, 64)).astype(np.int32)
        cfg = hls.SeqConfig(width=64, height=64,
                            chroma_format=hls.CHROMA_400, ctu_size=64,
                            min_qt_intra=16, min_qt_inter=16, qp=32)
        r = encoder.FrameEncoder(cfg).encode_frame(org, qp=32)
    finally:
        trace.set_tracer(None)
    events = [json.loads(ln) for ln in buf.getvalue().splitlines()]
    cus = [e for e in events if e["ch"] == "cu"]
    frames = [e for e in events if e["ch"] == "frame"]
    assert len(frames) == 1
    assert frames[0]["bits"] == r.num_bits
    # cu events cover the frame exactly once (no losing RD branches)
    area = sum(e["w"] * e["h"] for e in cus)
    assert area == 64 * 64
    assert all(e["kind"] == "intra" for e in cus)


def test_trace_disabled_is_noop():
    trace.set_tracer(None)
    assert not trace.enabled("cu")
    trace.event("cu", x=1)      # must not raise
