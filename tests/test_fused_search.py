"""Fused QT+BT batched search (codec/fused_search) + commit pass.

The fused search must (a) actually choose BT splits, (b) drive the
commit pass to oracle-bit-exact streams for intra and inter slices,
(c) honor the full 4-class MLT-CNN root-hint semantics, and (d) not
cost materially more bits than the QT-only batched search it replaces.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import batch_search, encoder, \
    fused_search, hls, partition

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="VTM oracle decoder not built")


def _content(w, h, seed=3):
    """Directional texture + edges so BT (not just QT) wins somewhere."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    org = (400 + 300 * np.sin(xx / 15.0) * np.sin(yy / 11.0)
           + rng.randint(-15, 15, (h, w)))
    org[:, w // 2:w // 2 + 3] = 950          # vertical edge
    org[h // 3:h // 3 + 2, :] = 80           # horizontal edge
    x0 = w // 4
    org[20:44, x0:x0 + 24] = rng.randint(200, 800, (24, 24))
    return np.clip(org, 0, 1023).astype(np.int32)


def _move(org, dx, dy):
    return np.roll(np.roll(org, dy, axis=0), dx, axis=1)


def _oracle(bitstream, w, h, frames=1):
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(bitstream)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stderr[-400:]
        raw = np.fromfile(yp, dtype="<u2")
        return raw.reshape(frames, h, w).astype(int)


def _cfg(w, h, **kw):
    kw.setdefault("max_mtt_depth_intra", 2)
    kw.setdefault("max_mtt_depth_inter", 2)
    kw.setdefault("max_bt_intra", 64)
    kw.setdefault("max_bt_inter", 64)
    return hls.SeqConfig(width=w, height=h,
                         chroma_format=hls.CHROMA_400, ctu_size=64,
                         min_qt_intra=8, min_qt_inter=8, qp=32, **kw)


def test_fused_search_chooses_bt():
    w, h = 128, 128
    org = _content(w, h)
    dec = fused_search.search_frame(org, _cfg(w, h), qp=32)
    splits = set(dec.split.values())
    assert partition.BT_H in splits or partition.BT_V in splits
    # rect leaves got modes
    rect = [k for k, v in dec.split.items()
            if v == partition.NO_SPLIT and k[2] != k[3]]
    assert rect
    for k in rect:
        assert dec.lookup_mode(*k) is not None


@needs_oracle
def test_fused_intra_commit_bitexact():
    w, h = 192, 128
    cfg = _cfg(w, h)
    org = _content(w, h)
    dec = fused_search.search_frame(org, cfg, qp=32)
    res = encoder.FrameEncoder(cfg).encode_frame(org, decisions=dec)
    out = _oracle(res.bitstream, w, h)[0]
    np.testing.assert_array_equal(out, res.recon)


@needs_oracle
def test_fused_inter_commit_bitexact():
    w, h = 128, 128
    cfg = _cfg(w, h)
    org0 = _content(w, h)
    org1 = np.clip(_move(org0, 3, -2)
                   + np.random.RandomState(9).randint(-6, 6, (h, w)),
                   0, 1023).astype(np.int32)
    fe = encoder.FrameEncoder(cfg)
    r0 = fe.encode_frame(org0, poc=0, qp=32)
    dec = fused_search.search_frame(
        org1, cfg, qp=32, slice_type=hls.P_SLICE,
        ref_planes=[(0, 0, r0.recon)])
    r1 = fe.encode_frame(org1, poc=1, qp=32, slice_type=hls.P_SLICE,
                         refs=[(0, r0)], decisions=dec)
    from fastintercu_vvc_tpu.codec.gop import split_nals, annexb
    nals = split_nals(r0.bitstream) + split_nals(r1.bitstream)[2:]
    out = _oracle(annexb(nals), w, h, frames=2)
    np.testing.assert_array_equal(out[0], r0.recon)
    np.testing.assert_array_equal(out[1], r1.recon)
    # the P frame must actually use inter prediction
    assert r1.inter_map.any()


@needs_oracle
def test_fused_hint_semantics():
    w, h = 128, 64
    cfg = _cfg(w, h)
    org = _content(w, h)
    for cls, want in ((0, partition.NO_SPLIT), (1, partition.QT_SPLIT),
                      (2, partition.BT_H), (3, partition.BT_V)):
        hints = np.full((1, 2), cls, np.int32)
        dec = fused_search.search_frame(org, cfg, qp=32,
                                        split_hints=hints)
        assert dec.split[(0, 0, 64, 64)] == want, cls
        res = encoder.FrameEncoder(cfg).encode_frame(org, decisions=dec)
        out = _oracle(res.bitstream, w, h)[0]
        np.testing.assert_array_equal(out, res.recon)


@needs_oracle
def test_fused_inter_border_deblock_bitexact():
    """Non-CTU-multiple picture + deblocking: the deblock CU-order
    inference must clamp border CTUs to the picture (regression:
    IndexError at 416-wide frames whose last CTU column is partial)."""
    w, h = 160, 80               # 160 = 2*64+32, 80 = 64+16
    cfg = _cfg(w, h, deblocking=True)
    org0 = _content(w, h)
    org1 = np.clip(_move(org0, 2, 1)
                   + np.random.RandomState(5).randint(-5, 5, (h, w)),
                   0, 1023).astype(np.int32)
    fe = encoder.FrameEncoder(cfg)
    r0 = fe.encode_frame(org0, poc=0, qp=32)
    dec = fused_search.search_frame(
        org1, cfg, qp=32, slice_type=hls.P_SLICE,
        ref_planes=[(0, 0, r0.recon)])
    r1 = fe.encode_frame(org1, poc=1, qp=32, slice_type=hls.P_SLICE,
                         refs=[(0, r0)], decisions=dec)
    from fastintercu_vvc_tpu.codec.gop import split_nals, annexb
    nals = split_nals(r0.bitstream) + split_nals(r1.bitstream)[2:]
    out = _oracle(annexb(nals), w, h, frames=2)
    np.testing.assert_array_equal(out[0], r0.recon)
    np.testing.assert_array_equal(out[1], r1.recon)


def test_fused_rate_not_worse_than_qt_only():
    w, h = 128, 128
    cfg = _cfg(w, h)
    org = _content(w, h)
    dec_f = fused_search.search_frame(org, cfg, qp=32)
    res_f = encoder.FrameEncoder(cfg).encode_frame(org, decisions=dec_f)
    dec_q = batch_search.search_intra_frame(org, cfg, 32)
    res_q = encoder.FrameEncoder(cfg).encode_frame(org, decisions=dec_q)
    assert res_f.num_bits <= res_q.num_bits * 1.05, \
        (res_f.num_bits, res_q.num_bits)
