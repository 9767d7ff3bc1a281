"""Arbitrary (non-CTU-multiple) picture sizes: implicit border splits
(UnitPartitioner.cpp:516 getImplicitSplit) + SPS conformance window
(VLCWriter.cpp:795 codeSPS). Streams must decode bit-exactly under the
VTM-11 oracle DecoderApp."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import encoder, hls, partition

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")

needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def oracle_decode(bitstream, w, h, chroma=False):
    with tempfile.TemporaryDirectory() as d:
        bin_path = os.path.join(d, "t.bin")
        yuv_path = os.path.join(d, "t.yuv")
        with open(bin_path, "wb") as f:
            f.write(bitstream)
        r = subprocess.run([ORACLE, "-b", bin_path, "-o", yuv_path],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-2000:]
        data = np.fromfile(yuv_path, dtype="<u2")
        if not chroma:
            return data.reshape(-1, h, w).astype(int)
        fsz = w * h * 3 // 2
        nf = len(data) // fsz
        out = []
        for i in range(nf):
            f = data[i * fsz:(i + 1) * fsz]
            out.append((f[:w * h].reshape(h, w).astype(int),
                        f[w * h:w * h * 5 // 4].reshape(h // 2, w // 2)
                        .astype(int),
                        f[w * h * 5 // 4:].reshape(h // 2, w // 2)
                        .astype(int)))
        return out


def content(w, h, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    org = (512 + 220 * np.sin(xx / 11.0) + 180 * np.cos(yy / 8.0)
           + rng.randint(-25, 25, (h, w)))
    return np.clip(org, 0, 1023).astype(np.int32)


def test_implicit_split_rules():
    pc = partition.PartitionConstraints(ctu_size=128, min_qt=8,
                                        max_mtt_depth=3, max_bt_size=128,
                                        max_tt_size=64)
    # fully inside -> no implicit split
    assert partition.implicit_split(0, 0, 128, 128, pc, 416, 240) \
        == partition.NO_SPLIT
    # crossing both borders, QT allowed -> QT
    assert partition.implicit_split(384, 128, 128, 128, pc, 416, 240) \
        == partition.QT_SPLIT
    # crossing bottom only, w<=64 -> BT_H
    assert partition.implicit_split(0, 192, 64, 64, pc, 416, 240) \
        == partition.BT_H
    # crossing right only, h<=64 -> BT_V
    assert partition.implicit_split(384, 0, 64, 64, pc, 416, 240) \
        == partition.BT_V
    # crossing bottom, w=128 > maxTB -> QT fallback
    assert partition.implicit_split(0, 192, 128, 128, pc, 416, 240) \
        == partition.QT_SPLIT
    # with an implicit split active: canNo off, TT off; QT stays legal
    # (the encoder may pick it over the implicit BT)
    cans = partition.can_split(64, 64, 1, 0, pc, x=384, y=0,
                               pic_w=416, pic_h=240)
    assert cans == (False, True, False, True, False, False)
    # 8x8 at the border with no BT budget: QT forced
    pc0 = partition.PartitionConstraints(ctu_size=64, min_qt=8,
                                         max_mtt_depth=0)
    cans = partition.can_split(8, 8, 3, 0, pc0, x=408, y=0,
                               pic_w=412, pic_h=240)
    assert cans[1] and not cans[0]


@needs_oracle
@pytest.mark.parametrize("w,h,ctu", [(80, 48, 64), (48, 80, 64),
                                     (208, 120, 128)])
def test_border_intra_bitexact(w, h, ctu):
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=ctu, min_qt_intra=8, min_qt_inter=8,
                        max_mtt_depth_intra=1, max_bt_intra=32,
                        max_tt_intra=32, qp=30)
    org = content(w, h)
    res = encoder.FrameEncoder(cfg).encode_frame(org, qp=30)
    dec = oracle_decode(res.bitstream, w, h)[0]
    np.testing.assert_array_equal(dec, res.recon)


@needs_oracle
def test_border_intra_420_bitexact():
    w, h = 104, 56   # 4:2:0, CTU 64 -> right 40, bottom 24 overhang
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, log2_min_cu=3, min_qt_intra=8,
                        min_qt_inter=8, max_mtt_depth_intra=1,
                        max_bt_intra=32, max_tt_intra=32, qp=32)
    y = content(w, h)
    u = content(w // 2, h // 2, 5)
    v = content(w // 2, h // 2, 7)
    res = encoder.FrameEncoder(cfg).encode_frame((y, u, v), qp=32)
    dy, du, dv = oracle_decode(res.bitstream, w, h, chroma=True)[0]
    np.testing.assert_array_equal(dy, res.recon)
    np.testing.assert_array_equal(du, res.recon_cb)
    np.testing.assert_array_equal(dv, res.recon_cr)


@needs_oracle
def test_border_inter_bitexact():
    """P frame on a non-CTU-multiple picture (merge/ME at borders)."""
    w, h = 80, 48
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8,
                        max_mtt_depth_inter=1, max_bt_inter=64,
                        max_tt_inter=32, qp=30, temporal_mvp=False)
    f0 = content(w, h, 1)
    f1 = np.roll(f0, (2, -3), axis=(0, 1))
    f1 = np.clip(f1 + np.random.RandomState(2).randint(
        -8, 8, (h, w)), 0, 1023).astype(np.int32)
    fe = encoder.FrameEncoder(cfg)
    r0 = fe.encode_frame(f0, poc=0, qp=30)
    r1 = fe.encode_frame(f1, poc=1, qp=31, slice_type=hls.P_SLICE,
                         refs=[(0, r0)])
    bs = r0.bitstream + r1.bitstream[
        len(hls.bitstream_for_frames(cfg, [])):]
    # simpler: rebuild one stream with both frames
    from fastintercu_vvc_tpu.codec.gop import split_nals
    nals0 = split_nals(r0.bitstream)
    nals1 = split_nals(r1.bitstream)
    from fastintercu_vvc_tpu.utils.bitstream import annexb
    bs = annexb(nals0 + nals1[2:])     # drop duplicate SPS/PPS
    frames = oracle_decode(bs, w, h)
    np.testing.assert_array_equal(frames[0], r0.recon)
    np.testing.assert_array_equal(frames[1], r1.recon)


@needs_oracle
def test_conformance_window_bitexact():
    """Source 60x36 -> coded 64x40 with a conformance window; the
    oracle's cropped output equals our recon cropped to the source."""
    sw, sh = 60, 36
    cfg = hls.config_for_source(sw, sh, chroma_format=hls.CHROMA_400,
                                ctu_size=64, min_qt_intra=8,
                                min_qt_inter=8, qp=30)
    assert (cfg.width, cfg.height) == (64, 40)
    assert (cfg.conf_win_right, cfg.conf_win_bottom) == (4, 4)
    src = content(sw, sh)
    org = np.pad(src, ((0, cfg.height - sh), (0, cfg.width - sw)),
                 mode="edge")
    res = encoder.FrameEncoder(cfg).encode_frame(org, qp=30)
    # the decoder crops to the conformance window
    dec = oracle_decode(res.bitstream, sw, sh)[0]
    np.testing.assert_array_equal(dec, res.recon[:sh, :sw])
