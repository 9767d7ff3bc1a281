"""ISP (intra sub-partitions) — CU::canUseISP / getISPSplitDim,
initIntraPatternChTypeISP reference construction, CU-dims wide-angle
mapping, implicit DST7 selection, per-partition cbf contexts with
last-cbf inference, chroma carried by the last sub-TU — verified
bit-exact by the VTM oracle.

Encoder restriction (documented): ISP is only *chosen* when the split
dimension is >= 16, keeping every partition >= 4 samples wide/high (no
1/2-wide TU residual coding). The signalled syntax is fully normative.
"""

import os
import subprocess

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls
from fastintercu_vvc_tpu.codec.encoder import FrameEncoder
from fastintercu_vvc_tpu.ops import intra

ORACLE = os.path.join(os.path.dirname(__file__), "..", "oracle",
                      "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def _decode_ok(bs, tmp_path, n_frames):
    p = tmp_path / "s.bin"
    p.write_bytes(bs)
    r = subprocess.run([ORACLE, "-b", str(p), "-o",
                        str(tmp_path / "r.yuv")],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr + r.stdout
    assert r.stdout.count("(OK)") == n_frames, r.stdout


def _frames_400(n, w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.clip(512 + 300 * np.sin((xx + 3 * t) / 5.0)
                    + 200 * np.cos(yy / 23.0)
                    + rng.randint(-30, 30, (h, w)), 0,
                    1023).astype(np.int32) for t in range(n)]


def test_isp_pred_params_cu_mapping():
    """Wide-angle mapping uses CU dims; smoothing disabled."""
    p = intra.pred_params(4, 16, 4, isp_cu_dims=(16, 16))
    # square CU: mode 4 not remapped even though the 16x4 partition
    # shape would remap it
    assert p["predMode"] == 4
    assert not p["refFilter"] and not p["interpFilter"]
    q = intra.pred_params(4, 16, 4)
    assert q["predMode"] != 4        # partition-shape mapping differs


def test_isp_planar_no_ref_filter():
    p = intra.pred_params(intra.PLANAR_IDX, 64, 16,
                          isp_cu_dims=(64, 64))
    assert not p["refFilter"]


@needs_oracle
def test_isp_signalling_bitexact(tmp_path):
    """isp_mode bins parse correctly alongside normal intra CUs."""
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, qp=30, isp=True,
                        mts_intra=True, picture_hash=True)
    enc = gop.SequenceEncoder(cfg, intra_period=1)
    res = enc.encode(_frames_400(2, 64, 64), qp=30)
    _decode_ok(res.bitstream, tmp_path, 2)


@needs_oracle
def test_isp_forced_selection_bitexact(tmp_path):
    """Force ISP to win RD so the coded path (per-partition refs,
    implicit DST7, cbf ctx/inference) is guaranteed exercised."""
    count = {"isp": 0, "hor": 0, "ver": 0}
    orig_eval = FrameEncoder._eval_isp
    orig_commit = FrameEncoder._commit_intra

    def forced(self, x, y, w, h, blk, mode, ver):
        t = orig_eval(self, x, y, w, h, blk, mode, ver)
        if t is not None:
            t["ssd"] = 0.0
        return t

    def counted(self, x, y, w, h, qt_depth, trial):
        if trial.get("isp"):
            count["isp"] += 1
            count["hor" if trial["isp"] == 1 else "ver"] += 1
        return orig_commit(self, x, y, w, h, qt_depth, trial)

    FrameEncoder._eval_isp = forced
    FrameEncoder._commit_intra = counted
    try:
        cfg = hls.SeqConfig(width=64, height=64,
                            chroma_format=hls.CHROMA_400, ctu_size=64,
                            min_qt_intra=16, qp=30, isp=True,
                            mts_intra=True, picture_hash=True)
        enc = gop.SequenceEncoder(cfg, intra_period=1)
        res = enc.encode(_frames_400(2, 64, 64), qp=30)
    finally:
        FrameEncoder._eval_isp = orig_eval
        FrameEncoder._commit_intra = orig_commit
    assert count["hor"] > 0 and count["ver"] > 0, count
    _decode_ok(res.bitstream, tmp_path, 2)


@needs_oracle
def test_isp_420_deblock_tools_bitexact(tmp_path):
    """ISP with 4:2:0, deblocking (no chroma edges at internal ISP
    partitions), LFNST/MIP/MRL/CCLM/joint-CbCr interplay."""
    count = {"isp": 0}
    orig_eval = FrameEncoder._eval_isp
    orig_commit = FrameEncoder._commit_intra

    def biased(self, x, y, w, h, blk, mode, ver):
        t = orig_eval(self, x, y, w, h, blk, mode, ver)
        if t is not None:
            t["ssd"] *= 0.25
        return t

    def counted(self, x, y, w, h, qt_depth, trial):
        if trial.get("isp"):
            count["isp"] += 1
        return orig_commit(self, x, y, w, h, qt_depth, trial)

    FrameEncoder._eval_isp = biased
    FrameEncoder._commit_intra = counted
    try:
        rng = np.random.RandomState(11)
        h, w = 64, 128
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(2):
            y = np.clip(512 + 300 * np.sin((xx + 3 * t) / 4.0)
                        * np.cos(yy / 9.0)
                        + rng.randint(-40, 40, (h, w)), 0,
                        1023).astype(np.int32)
            u = np.clip(y[::2, ::2] // 2 + 240, 0, 1023)
            v = np.clip(880 - y[::2, 1::2] // 2, 0, 1023)
            frames.append((y, u.astype(np.int32), v.astype(np.int32)))
        cfg = hls.SeqConfig(width=128, height=64, ctu_size=64,
                            min_qt_intra=16, qp=30, log2_min_cu=3,
                            isp=True, mts_intra=True, lfnst=True,
                            mrl=True, mip=True, cclm=True,
                            joint_cbcr=True, deblocking=True,
                            picture_hash=True)
        enc = gop.SequenceEncoder(cfg, intra_period=1)
        res = enc.encode(frames, qp=30)
    finally:
        FrameEncoder._eval_isp = orig_eval
        FrameEncoder._commit_intra = orig_commit
    assert count["isp"] > 0
    _decode_ok(res.bitstream, tmp_path, 2)
