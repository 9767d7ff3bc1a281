"""Multiple active reference frames: ref_idx signalling, per-ref
AMVP/ME, active-count slice-header override — oracle bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def mk(w, h, n):
    rng = np.random.RandomState(4)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        shift = 3 * t if t % 2 == 0 else 3 * t + 7   # alternating pan
        y = np.clip(512 + 220 * np.sin((xx - shift) / 13.0)
                    * np.cos((yy - t) / 17.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0), 0,
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


@pytest.mark.parametrize("num_refs", [2, 3])
def test_multiref_ippp_bitexact(num_refs):
    w = h = 128
    qp = 32
    frames = mk(w, h, 5)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp)
    res = gop.SequenceEncoder(cfg, me_range=8,
                              num_refs=num_refs).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 5)
    for t in range(5):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    # the second reference must actually win somewhere on this content
    far_used = 0
    for poc in range(2, 5):
        m = res.recons[poc].motion
        far_used += int((m.ref_poc0 == poc - 2).sum())
    assert far_used > 0


def test_multiref_with_tmvp_bitexact():
    """active_l0 > 1 triggers sh_collocated_ref_idx signalling."""
    w = h = 128
    qp = 32
    frames = mk(w, h, 4)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp, temporal_mvp=True)
    res = gop.SequenceEncoder(cfg, me_range=8,
                              num_refs=2).encode(frames, qp=qp)
    dec = decode_y(res.bitstream, w, h, 4)
    for t in range(4):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon)
