"""MIP (matrix-based intra prediction) — MatrixIntraPrediction.cpp
parity, verified bit-exact through the VTM oracle decoder (which
re-runs the matrix prediction; any deviation in the boundary
downsampling, matrix multiply or upsampling breaks the MD5s)."""

import os
import subprocess

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, gop, hls
from fastintercu_vvc_tpu.ops import mip as mip_ops

ORACLE = os.path.join(os.path.dirname(__file__), "..", "oracle",
                      "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def _decode_ok(bs, tmp_path, n_frames):
    p = tmp_path / "s.bin"
    p.write_bytes(bs)
    r = subprocess.run([ORACLE, "-b", str(p), "-o",
                        str(tmp_path / "r.yuv")],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr + r.stdout
    assert r.stdout.count("(OK)") == n_frames, r.stdout


def _frame(w, h, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    f = (500 + 260 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
         + 120 * np.sin((xx + 2 * yy) / 5.0)
         + rng.randint(-30, 30, (h, w)))
    return np.clip(f, 0, 1023).astype(np.int32)


def test_mip_predict_shapes_and_range():
    rng = np.random.RandomState(1)
    for (w, h) in [(4, 4), (8, 8), (4, 8), (16, 4), (16, 16), (32, 8),
                   (64, 64)]:
        top = rng.randint(0, 1024, 2 * w + 1).astype(np.int32)
        left = rng.randint(0, 1024, 2 * h + 1).astype(np.int32)
        n = mip_ops.num_modes(w, h)
        for mode in range(0, n, max(1, n // 3)):
            for tr in (False, True):
                p = mip_ops.predict(top, left, w, h, mode, tr)
                assert p.shape == (h, w)
                assert p.min() >= 0 and p.max() <= 1023


def test_mip_chosen_somewhere():
    # tool-mechanics test: pin the legacy lambda so the RD calibration
    # (FASTINTERCU_LAMBDA_SCALE) cannot price the tool out of selection
    # on this tiny clip
    import os
    os.environ["FASTINTERCU_LAMBDA_SCALE"] = "1"
    try:
        _run_mip()
    finally:
        os.environ.pop("FASTINTERCU_LAMBDA_SCALE", None)


def _run_mip():
    """On structured content some CTUs should pick MIP (else the tool
    is dead weight and the bitexact test proves nothing)."""
    cfg = hls.SeqConfig(width=128, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=37,
                        mip=True)
    fe = encoder.FrameEncoder(cfg)
    yy, xx = np.mgrid[0:64, 0:128]
    rng = np.random.RandomState(2)
    f = np.clip(512 + 220 * np.sin(xx / 17.0 + (yy / 13.0) ** 1.5)
                + rng.randint(-9, 9, (64, 128)),
                0, 1023).astype(np.int32)
    fe.encode_frame(f, qp=37)
    n_mip = sum(1 for (_, t) in fe.cu_log.values()
                if isinstance(t, dict) and "mip" in t)
    assert n_mip > 0


@needs_oracle
@pytest.mark.parametrize("qp", [24, 34])
def test_mip_allintra_bitexact(tmp_path, qp):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=8, min_qt_inter=8, qp=qp,
                        mip=True, picture_hash=True)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(_frame(64, 64, seed=7), qp=qp)
    _decode_ok(r.bitstream, tmp_path, 1)


@needs_oracle
def test_mip_420_cclm_mrl_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=30,
                        log2_min_cu=3, mip=True, cclm=True, mrl=True,
                        mts_intra=True, picture_hash=True)
    fe = encoder.FrameEncoder(cfg)
    y = _frame(64, 64, seed=9)
    r = fe.encode_frame((y, (y[::2, ::2] // 2 + 230).astype(np.int32),
                         (y[1::2, ::2] // 2 + 300).astype(np.int32)),
                        qp=30)
    _decode_ok(r.bitstream, tmp_path, 1)


@needs_oracle
def test_mip_inter_slices_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        mip=True, temporal_mvp=True, picture_hash=True,
                        num_reorder_pics=2, max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=2, me_range=4)
    frames = [_frame(64, 64, seed=s) for s in (1, 2, 3)]
    res = enc.encode(frames, qp=32)
    _decode_ok(res.bitstream, tmp_path, 3)
