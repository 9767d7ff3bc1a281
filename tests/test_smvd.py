"""SMVD (symmetric MVD): slice-level symmetric reference-pair
derivation (EncGOP.cpp:2620), sym_mvd_flag syntax + mirrored-MVD
reconstruction (CABACWriter.cpp:1836, CABACReader mvd mirroring) —
oracle bit-exact on a hierarchical-B pyramid."""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.utils import trace

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def mk(w, h, n, seed=11):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        # constant-velocity pan: the symmetric-MVD sweet spot
        y = np.clip(512 + 280 * np.sin((xx - 1.8 * t) / 10.0)
                    * np.cos((yy - 0.9 * t) / 12.0)
                    + rng.randint(-5, 5, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy + t) / 6.0), 0,
                    1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def decode_y(bs, w, h, n):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bs)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == n * per, (out.size // per, n)
        return [out[t * per:t * per + w * h].reshape(h, w).astype(int)
                for t in range(n)]


def test_smvd_hierarchical_b_bitexact():
    w = h = 128
    qp = 33
    frames = mk(w, h, 5)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, smvd=True,
                        num_reorder_pics=2, max_dec_pic_buffering=5)
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = gop.RandomAccessEncoder(cfg, gop_size=4,
                                          me_range=8).encode(frames, qp=qp)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    assert any(e.get("smvd") for e in evs), "no CU chose SMVD"


def test_smvd_with_mmvd_and_tmvp_bitexact():
    """Tool interaction: SMVD + MMVD + TMVP together in one stream."""
    w = h = 128
    qp = 35
    frames = mk(w, h, 5, seed=5)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, smvd=True, mmvd=True,
                        temporal_mvp=True, num_reorder_pics=2,
                        max_dec_pic_buffering=5)
    res = gop.RandomAccessEncoder(cfg, gop_size=4,
                                  me_range=8).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
