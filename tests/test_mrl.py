"""MRL (multi-reference-line intra): line-k reference construction
(xFillReferenceSamples with multiRefIdx, IntraPrediction.cpp:991),
shifted angular indexing (:479-565), extend_ref_line + MPM-only mode
syntax — oracle bit-exact."""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, hls
from fastintercu_vvc_tpu.ops import intra
from fastintercu_vvc_tpu.utils import trace

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def decode_y(bs, w, h, n=1):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per
        return [out[t * per:t * per + w * h].reshape(h, w).astype(int)
                for t in range(n)]


def test_mrl_refs_layout():
    rng = np.random.RandomState(3)
    rec = rng.randint(0, 1024, (64, 64)).astype(np.int32)
    coded = np.ones((16, 16), bool)
    t2, l2 = intra.build_refs_grid(rec, 16, 16, 8, 8, 10, coded, mrl=2)
    assert len(t2) == 2 * 8 + 3 and len(l2) == 2 * 8 + 3
    # corner at (x-1-k, y-1-k); top row at y-1-k; left col at x-1-k
    assert t2[0] == rec[13, 13] and l2[0] == rec[13, 13]
    assert t2[3] == rec[13, 16] and l2[3] == rec[16, 13]
    assert t2[18] == rec[13, 31] and l2[18] == rec[31, 13]


def test_mrl_allintra_bitexact():
    """Diagonal stripes with a corrupted adjacent line: the farther
    reference lines predict cleanly, so MRL must win somewhere."""
    w = h = 128
    qp = 30
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(400 + 280 * np.sin((xx + 2 * yy) / 4.0)
                + rng.randint(-3, 3, (h, w)), 0, 1023).astype(np.int32)
    u = np.full((h // 2, w // 2), 512, np.int32)
    v = np.full((h // 2, w // 2), 420, np.int32)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, mrl=True,
                        max_mtt_depth_intra=1)
    fe = encoder.FrameEncoder(cfg)
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = fe.encode_frame((y, u, v), poc=0, qp=qp,
                                  slice_type=hls.I_SLICE)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    dec = decode_y(res.bitstream, w, h)[0]
    np.testing.assert_array_equal(dec, res.recon)
    assert any(e.get("mrl") for e in evs), "no CU chose MRL"
