"""Batched search + CNN pruning + training-data pipeline tests."""

import os
import subprocess
import tempfile

import jax
import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import batch_search, encoder, hls
from fastintercu_vvc_tpu.models import data as mdata
from fastintercu_vvc_tpu.models import mlt_cnn, pruning, train
from fastintercu_vvc_tpu.ops import intra, intra_batch, rdcost

import jax.numpy as jnp

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def _content(w, h, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    org = (400 + 300 * np.sin(xx / 15.0) * np.sin(yy / 11.0)
           + rng.randint(-15, 15, (h, w)))
    x0, x1 = w // 4, w // 4 + max(8, w // 3)
    org[20:50, x0:x1] = rng.randint(200, 800, (30, x1 - x0))
    return np.clip(org, 0, 1023).astype(np.int32)


def _oracle(bitstream, w, h):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0
        return np.fromfile(yp, dtype="<u2").reshape(h, w).astype(int)


@pytest.mark.parametrize("mode", [0, 1, 2, 18, 34, 44, 50, 66])
@pytest.mark.parametrize("shape", [(8, 8), (16, 32)])
def test_batched_prediction_bitexact(mode, shape):
    w, h = shape
    rng = np.random.RandomState(1)
    tops = rng.randint(0, 1024, (4, 2 * w + 1)).astype(np.int32)
    lefts = rng.randint(0, 1024, (4, 2 * h + 1)).astype(np.int32)
    lefts[:, 0] = tops[:, 0]
    batch = np.asarray(intra_batch.predict_batch(
        mode, jnp.asarray(tops), jnp.asarray(lefts), w, h))
    for n in range(4):
        ref = intra.predict(mode, tops[n], lefts[n], w, h)
        np.testing.assert_array_equal(batch[n], ref)


def test_satd_matches_direct_hadamard():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 1024, (3, 16, 16)))
    b = jnp.asarray(rng.randint(0, 1024, (3, 16, 16)))
    got = np.asarray(rdcost.satd(a, b))
    # direct per-8x8 computation
    h8 = np.asarray(rdcost._hadamard(8))
    for n in range(3):
        total = 0
        d = np.asarray(a[n]).astype(np.int64) - np.asarray(b[n])
        for by in range(2):
            for bx in range(2):
                sub = d[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                t = h8 @ sub @ h8
                total += (np.abs(t).sum() + 2) >> 2
        assert got[n] == total


@needs_oracle
def test_batched_search_commit_bitexact():
    w, h = 192, 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8, qp=32)
    org = _content(w, h)
    decs = batch_search.search_intra_frame(org, cfg, 32)
    res = encoder.FrameEncoder(cfg).encode_frame(org, decisions=decs)
    dec = _oracle(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)
    assert (res.cu_map >> 16).min() < 64   # search actually split


@needs_oracle
def test_cnn_pruned_encode_bitexact():
    w, h = 128, 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8, qp=32)
    org = _content(w, h)
    model = mlt_cnn.MltCnnL3(num_blocks=(1, 1, 1, 1), widths=(8, 8, 8, 8))
    variables = mlt_cnn.init_params(model, jax.random.PRNGKey(0),
                                    batch=1, size=64)
    classes = pruning.predict_split_modes(model, variables, org, None,
                                          poc=0, qp=32, ctu_size=64)
    hints = pruning.split_hints_from_classes(classes)
    decs = batch_search.search_intra_frame(org, cfg, 32, split_hints=hints)
    res = encoder.FrameEncoder(cfg).encode_frame(org, decisions=decs)
    dec = _oracle(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)
    # forcing no-split must also produce a valid stream
    decs0 = batch_search.search_intra_frame(
        org, cfg, 32, split_hints=np.zeros((2, 2), np.int32))
    res0 = encoder.FrameEncoder(cfg).encode_frame(org, decisions=decs0)
    dec0 = _oracle(res0.bitstream, w, h)
    np.testing.assert_array_equal(dec0, res0.recon)
    assert (res0.cu_map >> 16).min() == 64  # hints respected


def test_label_extraction_and_training_step():
    w = h = 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=32, min_qt_inter=32,
                        qp=32)
    frames = [_content(w, h, s) for s in range(2)]
    samples = mdata.extract_from_frames(frames, cfg, qp=32)
    assert len(samples.label) == 2
    assert set(samples.label) <= {0, 1, 2, 3}
    # hierarchy mapping
    assert mdata.gt_to_coarse(0) == (0, 0, 0)
    assert mdata.gt_to_coarse(1) == (1, 1, 1)
    assert mdata.gt_to_coarse(3) == (1, 2, 3)
    # one training step on the extracted samples runs end to end
    model = mlt_cnn.MltCnnL3(num_blocks=(1, 1, 1, 1), widths=(4, 4, 4, 4))
    tx = train.make_adam(1e-3)
    state = train.create_train_state(model, jax.random.PRNGKey(0), tx)
    batch = samples.to_batch(np.arange(len(samples.label)))
    step = jax.jit(train.make_train_step(model, tx))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
