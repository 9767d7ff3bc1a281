"""MCTF temporal prefilter (EncTemporalFilter parity at the behavior
level; TPU-first batched JAX implementation). Non-normative — tests
check denoising behavior, the CTC strength schedule, motion tracking,
and that a filtered encode still decodes bit-exactly."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.ops import mctf

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")


def noisy_sequence(w, h, n, sigma=14, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    clean = []
    noisy = []
    for t in range(n):
        c = np.clip(512 + 300 * np.sin((xx - 3 * t) / 11.0)
                    * np.cos(yy / 9.0), 0, 1023)
        clean.append(c)
        noisy.append(np.clip(
            c + rng.normal(0, sigma, (h, w)), 0, 1023).astype(np.int32))
    return clean, noisy


def test_strength_schedule():
    assert mctf.filter_strength(0) == 1.5     # 16th beats 8th
    assert mctf.filter_strength(8) == 0.95
    assert mctf.filter_strength(16) == 1.5
    assert mctf.filter_strength(3) is None
    assert mctf.filter_strength(12) is None


def test_mctf_denoises_translating_content():
    w = h = 64
    clean, noisy = noisy_sequence(w, h, 5)
    out = mctf.mctf_frame(noisy, 2, qp=32, strength=1.5)
    err_before = float(np.abs(noisy[2] - clean[2]).mean())
    err_after = float(np.abs(out - clean[2]).mean())
    assert err_after < 0.75 * err_before, (err_before, err_after)


def test_motion_search_tracks_shift():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 1024, (96, 96)).astype(np.int32)
    org = base[16:80, 16:80]
    ref = base[13:77, 18:82]     # org(y,x) = ref(y+3, x-2)
    mvs = np.asarray(mctf.motion_search(org, ref, block=16))
    # interior blocks must find (dy, dx) = (3, -2)
    assert (mvs[1:3, 1:3, 0] == 3).all()
    assert (mvs[1:3, 1:3, 1] == -2).all()


def test_mctf_sequence_schedule_only_touches_scheduled_frames():
    w = h = 64
    _, noisy = noisy_sequence(w, h, 9)
    out = mctf.mctf_sequence(noisy, qp=32)
    assert out[0] is not noisy[0] or (out[0] == noisy[0]).all() is False
    for i in (1, 2, 3, 5, 6, 7):
        np.testing.assert_array_equal(out[i], noisy[i])
    assert not np.array_equal(out[8], noisy[8])


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="VTM oracle decoder not built")
def test_mctf_encode_bitexact():
    from fastintercu_vvc_tpu.codec import gop, hls
    w = h = 128
    qp = 32
    _, noisy = noisy_sequence(w, h, 3, sigma=8)
    u = np.full((h // 2, w // 2), 512, np.int32)
    v = np.full((h // 2, w // 2), 420, np.int32)
    frames = [(y, u, v) for y in noisy]
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=qp)
    res = gop.SequenceEncoder(cfg, me_range=8,
                              mctf=True).encode(frames, qp=qp)
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(res.bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        for t in range(3):
            dec = out[t * per:t * per + w * h].reshape(h, w)
            np.testing.assert_array_equal(dec, res.recons[t].recon)
