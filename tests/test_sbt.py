"""SBT (sub-block transform): half/quarter residual TUs with implied
DST7/DCT8 pairs (TrQuant.cpp:666), cu_sbt syntax (CABACWriter.cpp:1376),
TU-accurate deblocking edges — oracle bit-exact."""

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


def mk(w, h, n, seed=47):
    """Static background + a new object appearing on one side of each
    frame: inter residual concentrated in one half -> SBT's case."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    bg = np.clip(512 + 200 * np.sin(xx / 12.0) * np.cos(yy / 10.0),
                 0, 1023)
    fs = []
    for t in range(n):
        y = bg.copy()
        # moving textured patch confined to the right half of blocks
        px = (40 + 16 * t) % (w - 32)
        y[:, px:px + 24] += 150 * np.sin(yy[:, px:px + 24] / 3.0)
        y = np.clip(y + rng.randint(-3, 3, (h, w)), 0,
                    1023).astype(np.int32)
        u = np.full((h // 2, w // 2), 512, np.int32)
        v = np.full((h // 2, w // 2), 420, np.int32)
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
        assert out.size == n * per
        return [out[t * per:t * per + w * h].reshape(h, w).astype(int)
                for t in range(n)]


@pytest.mark.parametrize("mts", [False, True])
def test_sbt_ippp_bitexact(mts):
    """SBT with DCT2 (sps MTS off) and with the implied DST7/DCT8
    pairs (sps MTS on), deblocking on (SBT TU edges)."""
    w = h = 128
    qp = 32
    frames = mk(w, h, 4, seed=47 if mts else 53)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, sbt=True, deblocking=True,
                        mts_intra=mts)
    with tempfile.TemporaryDirectory() as d:
        tp = os.path.join(d, "t.jsonl")
        t = trace.open_trace(tp, channels=["cu"])
        try:
            res = gop.SequenceEncoder(cfg, me_range=8).encode(frames,
                                                              qp=qp)
        finally:
            t.close()
            trace.set_tracer(None)
        evs = [json.loads(ln) for ln in open(tp)]
    dec = decode_y(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    assert any("sbt" in e for e in evs), "no CU chose SBT"


def test_sbt_b_with_tools_bitexact():
    w = h = 128
    qp = 33
    frames = mk(w, h, 5, seed=59)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, sbt=True, mmvd=True,
                        bcw=True, ciip=True, joint_cbcr=True,
                        deblocking=True, num_reorder_pics=2,
                        max_dec_pic_buffering=5)
    res = gop.RandomAccessEncoder(cfg, gop_size=4,
                                  me_range=8).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
