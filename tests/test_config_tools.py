"""Config system (VTM/CTC cfg-file parser, program_options_lite parity)
and bitstream tools (NAL inventory, SEI removal, parcat)."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from fastintercu_vvc_tpu.codec import config, encoder, gop, hls
from fastintercu_vvc_tpu.utils import bittools

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "oracle", "build", "vtm_decoder")


CFG_BASE = """
# CTC-style base cfg
SourceWidth      : 128       # trailing comment
SourceHeight     : 128
InternalBitDepth : 10
CTUSize          : 64
QP               : 33
DepQuant         : 1
SAO              : 1
MMVD             : 1
BCW              : 1
TMVPMode         : 1
LoopFilterDisable: 0
FramesToBeEncoded: 3
SearchRange      : 16
UnknownFancyTool : 7
"""

CFG_OVER = """
QP  : 30
SAO : 0
"""


def test_cfg_layering():
    with tempfile.TemporaryDirectory() as d:
        p1, p2 = os.path.join(d, "a.cfg"), os.path.join(d, "b.cfg")
        open(p1, "w").write(CFG_BASE)
        open(p2, "w").write(CFG_OVER)
        rc = config.load([p1, p2])
    assert rc.seq.width == 128 and rc.seq.ctu_size == 64
    assert rc.seq.qp == 30                  # later file wins
    assert rc.seq.sao is False
    assert rc.seq.mmvd and rc.seq.bcw and rc.seq.temporal_mvp
    assert rc.seq.dep_quant and rc.seq.deblocking
    assert rc.run["frames"] == 3 and rc.run["search_range"] == 16
    assert "UnknownFancyTool" in rc.unknown


def test_ctc_reference_cfg_parses():
    """The actual CTC random-access cfg from the reference tree must
    parse (unknown keys collected, known tools mapped)."""
    path = ("/root/reference/vtm-mlt-cpp/cfg/"
            "encoder_randomaccess_vtm.cfg")
    if not os.path.exists(path):
        pytest.skip("reference cfg not available")
    rc = config.load([path])
    assert rc.seq.qp == 32
    assert rc.seq.dep_quant and rc.seq.alf and rc.seq.mmvd
    assert rc.seq.geo and rc.seq.ciip and rc.seq.bcw
    assert rc.run["gop_size"] == 32 and rc.run["intra_period"] == 32
    assert rc.run["mctf"] is True


def _tiny_stream(n=2, hash_sei=True):
    rng = np.random.RandomState(3)
    w = h = 64
    frames = []
    for t in range(n):
        y = rng.randint(0, 1024, (h, w)).astype(np.int32)
        u = np.full((32, 32), 512, np.int32)
        v = np.full((32, 32), 400, np.int32)
        frames.append((y, u, v))
    cfg = hls.SeqConfig(width=w, height=h, chroma_format=hls.CHROMA_420,
                        ctu_size=64, min_qt_intra=16, min_qt_inter=16,
                        log2_min_cu=3, qp=35, picture_hash=hash_sei)
    return gop.SequenceEncoder(cfg, me_range=4).encode(frames,
                                                       qp=35), w, h


def test_nal_inventory_and_sei_removal():
    res, w, h = _tiny_stream()
    nals = bittools.list_nals(res.bitstream)
    names = [e["name"] for e in nals]
    assert names[0] == "SPS" and names[1] == "PPS"
    assert "SUFFIX_SEI" in names
    stripped = bittools.remove_sei(res.bitstream)
    names2 = [e["name"] for e in bittools.list_nals(stripped)]
    assert "SUFFIX_SEI" not in names2
    assert names2.count("IDR_N_LP") == 1


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="VTM oracle decoder not built")
def test_parcat_decodes():
    res1, w, h = _tiny_stream(2, hash_sei=False)
    res2, _, _ = _tiny_stream(2, hash_sei=False)
    joined = bittools.parcat([res1.bitstream, res2.bitstream])
    with tempfile.TemporaryDirectory() as d:
        bp, yp = os.path.join(d, "t.bin"), os.path.join(d, "t.yuv")
        open(bp, "wb").write(joined)
        r = subprocess.run([ORACLE, "-b", bp, "-o", yp],
                           capture_output=True, timeout=300)
        assert r.returncode == 0, r.stdout.decode()[-1500:]
        out = np.fromfile(yp, dtype="<u2")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert out.size == 4 * per     # all four frames decoded


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="VTM oracle decoder not built")
def test_cli_cfg_encode():
    """End-to-end: encode driven by a cfg file through the CLI."""
    rng = np.random.RandomState(5)
    w = h = 64
    raw = b""
    for t in range(2):
        y = rng.randint(0, 1024, (h, w)).astype("<u2")
        u = np.full((32, 32), 512, "<u2")
        v = np.full((32, 32), 400, "<u2")
        raw += y.tobytes() + u.tobytes() + v.tobytes()
    with tempfile.TemporaryDirectory() as d:
        yp = os.path.join(d, "in.yuv")
        open(yp, "wb").write(raw)
        cp = os.path.join(d, "t.cfg")
        open(cp, "w").write(f"""
InputFile        : {yp}
BitstreamFile    : {os.path.join(d, "out.bin")}
SourceWidth      : 64
SourceHeight     : 64
QP               : 34
FramesToBeEncoded: 2
SAO              : 1
""")
        r = subprocess.run(
            [sys.executable, "-m", "fastintercu_vvc_tpu", "encode",
             "-c", cp, "--recon", os.path.join(d, "rec.yuv")],
            capture_output=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            # CPU backend: the TPU tunnel takes ~80 s to initialize in
            # a fresh process, which under load blows the timeout
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, (r.stdout.decode()[-800:],
                                   r.stderr.decode()[-800:])
        rr = subprocess.run([ORACLE, "-b", os.path.join(d, "out.bin"),
                             "-o", os.path.join(d, "dec.yuv")],
                            capture_output=True, timeout=300)
        assert rr.returncode == 0
        dec = open(os.path.join(d, "dec.yuv"), "rb").read()
        rec = open(os.path.join(d, "rec.yuv"), "rb").read()
        assert dec == rec
