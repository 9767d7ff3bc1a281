"""CTC RA structure: hierarchical QP cascade, CRA/RASL open-GOP
anchors, temporal ids, multi-active refs (encoder_randomaccess_vtm.cfg
Frame1-32 table; EncSlice::initEncSlice / EncCfg::getQPForPicture)."""

import os
import subprocess

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import gop, hls

ORACLE = os.path.join(os.path.dirname(__file__), "..", "oracle",
                      "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def _decode(bs, tmp_path):
    p = tmp_path / "s.bin"
    p.write_bytes(bs)
    out = tmp_path / "r.yuv"
    r = subprocess.run([ORACLE, "-b", str(p), "-o", str(out)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr + r.stdout
    return out.read_bytes(), r.stdout


def _frames(n, w=64, h=64, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.clip(512 + 300 * np.sin((xx + 3 * t) / 11.0)
                    * np.cos((yy - 2 * t) / 7.0)
                    + rng.randint(-8, 8, (h, w)), 0, 1023)
            .astype(np.int32) for t in range(n)]


def test_ctc_qp_model():
    # spot values vs getQPForPicture hand-eval at base QP 32
    assert gop.ctc_qp_for(32, 0) == 31
    assert gop.ctc_qp_for(32, 1) == 34          # 32+0 -> +floor(2.81)
    assert gop.ctc_qp_for(32, 5) == 41          # 38 -> +3 (clip)
    assert gop.ctc_qp_for(32, 0, is_intra=True) == 29


@needs_oracle
def test_ra_hierarchical_qp_bitexact(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=32,
                        temporal_mvp=True, picture_hash=True,
                        num_reorder_pics=3, max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=8, hierarchical_qp=True,
                                  me_range=4)
    frames = _frames(9)
    res = enc.encode(frames, qp=32)
    _, log = _decode(res.bitstream, tmp_path)
    assert log.count("[MD5:") == 9 and "***ERROR" not in log
    # tid-5-free gop8 pyramid: QPs ramp with temporal layer
    # (I anchor at base-3, anchors at base-1, deepest Bs higher)
    assert res.frame_types[0] == "I"


@needs_oracle
def test_ra_cra_rasl_open_gop(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=34,
                        picture_hash=True,
                        num_reorder_pics=2, max_dec_pic_buffering=6)
    enc = gop.RandomAccessEncoder(cfg, gop_size=4, hierarchical_qp=True,
                                  intra_period=4, me_range=4)
    frames = _frames(9, seed=3)
    res = enc.encode(frames, qp=34)
    # NAL inventory: CRA anchors + RASL leading pictures present
    nals = gop.split_nals(res.bitstream)
    types = [(n[1] >> 3) & 0x1F for n in nals]
    assert hls.NAL_CRA in types
    assert hls.NAL_RASL in types
    _, log = _decode(res.bitstream, tmp_path)
    assert log.count("[MD5:") == 9 and "***ERROR" not in log


@needs_oracle
def test_ra_gop32_structure(tmp_path):
    cfg = hls.SeqConfig(width=64, height=64,
                        chroma_format=hls.CHROMA_400, ctu_size=64,
                        min_qt_intra=16, min_qt_inter=16, qp=37,
                        temporal_mvp=True, picture_hash=True,
                        num_reorder_pics=5, max_dec_pic_buffering=9)
    enc = gop.RandomAccessEncoder(cfg, gop_size=32,
                                  hierarchical_qp=True, me_range=4)
    frames = _frames(33, seed=5)
    res = enc.encode(frames, qp=37)
    _, log = _decode(res.bitstream, tmp_path)
    assert log.count("[MD5:") == 33 and "***ERROR" not in log
