"""End-to-end bit-exactness: our encoder's bitstreams must decode under
the reference VTM-11 DecoderApp (oracle/) to exactly our reconstruction.

This is the executable spec (SURVEY.md §4): VTM decode == our recon.
Skipped when the oracle binary hasn't been built
(cmake -S oracle -B oracle/build && cmake --build oracle/build -j).
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import hls
from fastintercu_vvc_tpu.codec import encoder as intra_encoder

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="VTM oracle decoder not built")


def oracle_decode(bitstream: bytes, w: int, h: int) -> np.ndarray:
    with tempfile.TemporaryDirectory() as d:
        bin_path = os.path.join(d, "t.bin")
        yuv_path = os.path.join(d, "t.yuv")
        with open(bin_path, "wb") as f:
            f.write(bitstream)
        r = subprocess.run([ORACLE, "-b", bin_path, "-o", yuv_path],
                           capture_output=True, timeout=120)
        assert r.returncode == 0, r.stdout.decode()[-2000:]
        return np.fromfile(yuv_path, dtype="<u2").reshape(h, w).astype(int)


def make_content(kind, w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "smooth":
        org = (512 + 300 * np.sin(xx / 17.0) * np.cos(yy / 13.0))
    elif kind == "noise":
        org = rng.randint(0, 1024, (h, w))
    else:
        org = (512 + 200 * np.sin(xx / 9.0) + 150 * np.cos(yy / 7.0)
               + rng.randint(-30, 30, (h, w)))
    return np.clip(org, 0, 1023).astype(np.int32)


@pytest.mark.parametrize("qp", [22, 32, 42])
def test_intra_fixed_cu_bitexact(qp):
    w, h = 192, 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=64, min_qt_inter=64,
                        qp=qp)
    org = make_content("mixed", w, h, qp)
    res = intra_encoder.IntraFrameEncoder(cfg).encode_frame(org, qp=qp)
    dec = oracle_decode(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)


@pytest.mark.parametrize("kind,qp", [("noise", 32), ("noise", 51),
                                     ("smooth", 27)])
def test_intra_fixed_cu_bitexact_content(kind, qp):
    w, h = 128, 128
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=64, min_qt_inter=64,
                        qp=qp)
    org = make_content(kind, w, h, qp)
    res = intra_encoder.IntraFrameEncoder(cfg).encode_frame(org, qp=qp)
    dec = oracle_decode(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)


def test_intra_qt_partition_bitexact():
    w, h = 64, 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8,
                        max_mtt_depth_intra=0, qp=30)
    rng = np.random.RandomState(7)
    xx = np.mgrid[0:h, 0:w][1]
    org = np.where(xx < 32, 300, 700) + rng.randint(-10, 10, (h, w))
    org[40:64, 8:24] = rng.randint(0, 1024, (24, 16))
    org = np.clip(org, 0, 1023).astype(np.int32)
    res = intra_encoder.IntraFrameEncoder(cfg).encode_frame(org)
    dec = oracle_decode(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)
    # the search must actually have split
    assert (res.cu_map >> 16).min() < 64


def test_intra_qtmt_partition_bitexact():
    w, h = 64, 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=8, min_qt_inter=8,
                        max_mtt_depth_intra=1, max_bt_intra=32,
                        max_tt_intra=32, qp=30)
    rng = np.random.RandomState(7)
    xx = np.mgrid[0:h, 0:w][1]
    org = np.where(xx < 32, 300, 700) + rng.randint(-10, 10, (h, w))
    org[40:64, 8:24] = rng.randint(0, 1024, (24, 16))
    org = np.clip(org, 0, 1023).astype(np.int32)
    res = intra_encoder.IntraFrameEncoder(cfg).encode_frame(org)
    dec = oracle_decode(res.bitstream, w, h)
    np.testing.assert_array_equal(dec, res.recon)
    # rectangular CUs prove BT/TT exercised
    wmap, hmap = res.cu_map >> 16, res.cu_map & 0xFFFF
    assert (wmap != hmap).any()


def test_all_67_intra_modes_bitexact():
    """Forced per-mode streams across the full mode range."""
    w, h = 64, 64
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_400,
                        ctu_size=64, min_qt_intra=64, min_qt_inter=64,
                        qp=30)
    org = make_content("mixed", w, h, 5)
    from fastintercu_vvc_tpu.codec import cabac, contexts, ctx_ids, residual
    from fastintercu_vvc_tpu.ops import intra as intra_ops
    from fastintercu_vvc_tpu.ops import transforms, quant
    import jax.numpy as jnp

    for mode in [0, 1, 2, 18, 34, 50, 66, 11, 39, 61]:
        bank = contexts.init_bank(contexts.I_SLICE, 30)
        enc = cabac.CabacEncoder(bank)
        recon = np.zeros((h, w), np.int32)
        top, left = intra_ops.build_refs(recon, 0, 0, w, h, 10)
        pred = intra_ops.predict(mode, top, left, w, h, 10)
        resi = org - pred
        coeff = np.asarray(transforms.fwd_transform_2d(jnp.asarray(resi[None])))[0]
        q = np.asarray(quant.quant(jnp.asarray(coeff[None]), 42, is_irap=True))[0]
        dq = np.asarray(quant.dequant(jnp.asarray(q[None]), 42))[0]
        r = np.asarray(transforms.inv_transform_2d(jnp.asarray(dq[None])))[0]
        recon[:] = np.clip(pred + r, 0, 1023)
        mpm = intra_ops.get_intra_mpms(None, None)
        intra_encoder.write_intra_luma_mode(enc, mode, mpm)
        cbf = bool(np.any(q))
        enc.encode_bin(1 if cbf else 0, ctx_ids.QtCbf[0][0])
        if cbf:
            residual.write_residual_coding(enc, q, residual.LUMA)
        enc.encode_bin_trm(1)
        payload = enc.finish()
        pic = hls.PicConfig(qp=30)
        bs = hls.bitstream_for_frames(cfg, [(pic, payload, enc.tail_bits())])
        dec = oracle_decode(bs, w, h)
        np.testing.assert_array_equal(dec, recon, err_msg=f"mode {mode}")
