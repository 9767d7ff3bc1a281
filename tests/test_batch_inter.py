"""Batched inter (P-frame) search — the FastInterCU deployment loop:
whole-frame device ME + intra/inter decision DP + CNN split-hint
pruning + decisions-driven commit; oracle bit-exact."""

import os
import subprocess
import tempfile

import numpy as np
import jax
import pytest

from fastintercu_vvc_tpu.codec import batch_search, gop, hls
from fastintercu_vvc_tpu.models import mlt_cnn, pruning

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def mk(w, h, n):
    rng = np.random.RandomState(4)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = np.mgrid[0:h // 2, 0:w // 2]
    fs = []
    for t in range(n):
        y = np.clip(512 + 220 * np.sin((xx - 4 * t) / 13.0)
                    * np.cos((yy - t) / 17.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023).astype(np.int32)
        u = np.clip(512 + 150 * np.sin((cx - t) / 7.0), 0,
                    1023).astype(np.int32)
        v = np.clip(512 - 120 * np.cos((cy - t) / 6.0), 0,
                    1023).astype(np.int32)
        fs.append((y, u, v))
    return fs


def oracle_frames(bs, w, h, n):
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


@needs_oracle
def test_batched_ippp_bitexact():
    w = h = 128
    frames = mk(w, h, 3)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=32)
    res = gop.BatchedSequenceEncoder(cfg, me_range=8).encode(frames,
                                                             qp=32)
    assert res.frame_types == ["I", "P", "P"]
    dec = oracle_frames(res.bitstream, w, h, 3)
    for t in range(3):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon,
                                      err_msg=f"f{t}")
    # inter decisions must dominate on panning content
    assert (np.asarray(res.recons[1].inter_map).sum()
            > res.recons[1].inter_map.size // 2)


@needs_oracle
def test_cnn_pruned_batched_inter_bitexact():
    """The full reference loop: CNN per-CTU split classes -> hints ->
    batched inter search -> commit, for P frames."""
    w = h = 128
    frames = mk(w, h, 3)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=32)
    model = mlt_cnn.MltCnnL3(num_blocks=(1, 1, 1, 1), widths=(8, 8, 8, 8))
    variables = mlt_cnn.init_params(model, jax.random.PRNGKey(0),
                                    batch=1, size=64)

    def hints_fn(luma, prev_recon, poc):
        classes = pruning.predict_split_modes(
            model, variables, luma, prev_recon, poc=poc, qp=32,
            ctu_size=64)
        return pruning.split_hints_from_classes(classes)

    res = gop.BatchedSequenceEncoder(
        cfg, me_range=8, split_hints_fn=hints_fn).encode(frames, qp=32)
    dec = oracle_frames(res.bitstream, w, h, 3)
    for t in range(3):
        np.testing.assert_array_equal(dec[t], res.recons[t].recon)


def test_inter_decisions_structure():
    w = h = 64
    rng = np.random.RandomState(0)
    org = rng.randint(0, 1024, (h, w)).astype(np.int32)
    ref = np.roll(org, 3, axis=1)
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        qp=32)
    dec = batch_search.search_inter_frame(org, ref, cfg, 32, me_range=4)
    inter_leaves = [v for v in dec.mode.values()
                    if isinstance(v, tuple) and v[0] == "inter"]
    assert inter_leaves, "no inter decision on shifted content"
    # the dominant MV must match the 3-px shift (internal 1/16 units)
    mvs = [m[1] for m in inter_leaves]
    assert any(mv == (-48, 0) or mv == (48, 0) for mv in mvs), mvs
