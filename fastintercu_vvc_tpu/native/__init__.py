"""Native (C) runtime components: the sequential CABAC engine.

Built on demand with the system compiler (no pip deps); loaded via
ctypes. Falls back to the pure-Python engine when compilation is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcabac.so")
_SRCS = [os.path.join(_DIR, "cabac_engine.c"),
         os.path.join(_DIR, "residual_ops.c"),
         os.path.join(_DIR, "commit_kernel.c"),
         os.path.join(_DIR, "depquant.c"),
         os.path.join(_DIR, "loopfilter.c"),
         os.path.join(_DIR, "chroma_kernel.c")]

_lib = None


def _build():
    subprocess.run(["cc", "-O3", "-shared", "-fPIC", *_SRCS, "-o", _SO,
                    "-lm"],
                   check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native CABAC library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or any(
                os.path.getmtime(_SO) < os.path.getmtime(s) for s in _SRCS):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.cabac_run.restype = ctypes.c_int64
        lib.cabac_run.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint32)]
        _i32p = ctypes.POINTER(ctypes.c_int32)
        _u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ck_init.restype = None
        lib.ck_init.argtypes = [_i32p, ctypes.c_int64]
        lib.ck_ready.restype = ctypes.c_int
        lib.ck_eval_intra.restype = None
        lib.ck_eval_intra.argtypes = [
            _i32p, _i32p, ctypes.c_int, ctypes.c_int,     # org, recon, W, H
            _u8p, ctypes.c_int, ctypes.c_int,              # coded, gw, gh
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # x y w h
            ctypes.c_int, ctypes.c_int, ctypes.c_int,      # mode, mrl, qp
            ctypes.c_int, ctypes.c_int, ctypes.c_int,      # bd, flags, xmax
            ctypes.c_double,                               # lam
            _i32p, _i32p, _i32p,                           # q, recon, meta
            ctypes.POINTER(ctypes.c_double)]               # ssd
        lib.ck_mode_sads.restype = None
        lib.ck_mode_sads.argtypes = [
            _i32p, _i32p, ctypes.c_int, ctypes.c_int,
            _u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, _i32p, ctypes.c_int,
            _i32p, ctypes.POINTER(ctypes.c_int64)]
        lib.ck_predict.restype = None
        lib.ck_predict.argtypes = [
            ctypes.c_int, _i32p, _i32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, _i32p]
        lib.ck_fwd_xform.restype = None
        lib.ck_fwd_xform.argtypes = [_i32p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, _i32p]
        lib.ck_inv_xform.restype = None
        lib.ck_inv_xform.argtypes = [_i32p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, _i32p]
        lib.cabac_exec.restype = ctypes.c_int64
        lib.cabac_exec.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16),
            _u8p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), _u8p]
        lib.dq_trellis.restype = ctypes.c_int64
        lib.dq_trellis.argtypes = [
            ctypes.POINTER(ctypes.c_int64), _i32p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_double,
            ctypes.c_double, _i32p]
        lib.residual_ops.restype = ctypes.c_int64
        lib.residual_ops.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
        lib.ck_eval_chroma.restype = None
        lib.ck_eval_chroma.argtypes = (
            [_i32p] * 4 + [ctypes.c_int] * 2          # chroma planes, Wc, Hc
            + [_i32p, ctypes.c_int, ctypes.c_int]      # recon_y, W, H
            + [_u8p, ctypes.c_int, ctypes.c_int]       # coded, gw, gh
            + [ctypes.c_int] * 4                       # x y w h
            + [ctypes.c_int] * 7                       # mode qp bd flags xmax ctu lmcs
            + [ctypes.c_double]                        # lam
            + [_i32p] * 4                              # q_cb q_cr rec_cb rec_cr
            + [_i32p, ctypes.POINTER(ctypes.c_double)])
        lib.ck_pair_eval.restype = None
        lib.ck_pair_eval.argtypes = (
            [_i32p] * 4 + [ctypes.c_int] * 5 + [ctypes.c_int]
            + [ctypes.c_double] + [_i32p] * 4
            + [_i32p, ctypes.POINTER(ctypes.c_double)])
        lib.lf_deblock_frame.restype = ctypes.c_int
        lib.lf_deblock_frame.argtypes = (
            [_i32p, _i32p, _i32p, ctypes.c_int, ctypes.c_int]
            + [_i32p] * 4 + [_u8p] * 4
            + [_i32p, _i32p, _i32p, _i32p, ctypes.c_int]
            + [_i32p] * 4
            + [_u8p, _i32p, _i32p, _u8p]
            + [ctypes.c_int] * 4)
        _lib = lib
        return lib
    except Exception:
        return None


def residual_ops(coeff, is_chroma: int, log2_cg_w: int, log2_cg_h: int,
                 ctxb, sign_hiding: int = 0) -> np.ndarray:
    """Generate the bin-op stream for one TU component natively.
    coeff: [H, W] int array of quantized levels (>= one nonzero).
    ctxb: 15 context-base ints (see residual_ops.c).
    sign_hiding: SDH stream semantics (hidden first sign per CG when
    last-first nonzero span >= 4; the caller already parity-adjusted
    the levels via apply_sign_hiding)."""
    lib = get_lib()
    assert lib is not None
    c = np.ascontiguousarray(coeff, np.int32)
    h, w = c.shape
    cb = np.ascontiguousarray(ctxb, np.int32)
    cap = 4 * w * h + 256
    out = np.empty(cap, np.uint32)
    n = lib.residual_ops(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h,
        int(is_chroma), log2_cg_w, log2_cg_h, int(sign_hiding),
        cb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
    if n < -2:                       # capacity miss: retry exact size
        cap = -n
        out = np.empty(cap, np.uint32)
        n = lib.residual_ops(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), w, h,
            int(is_chroma), log2_cg_w, log2_cg_h, int(sign_hiding),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
    assert n >= 0, f"residual_ops error {n}"
    return out[:n]


def lf_deblock_frame(recon_y, recon_cb, recon_cr, info, qp, qp_c,
                     bit_depth, ctu_size) -> bool:
    """Native deblock_frame (loopfilter.c) over ops.deblock.DeblockInfo
    arrays. Mutates the planes in place. -> True on success, False when
    the native path is unavailable or partition inference failed (the
    caller falls back to the Python twin)."""
    lib = get_lib()
    if lib is None:
        return False
    H, W = recon_y.shape

    def i32(a):
        return np.ascontiguousarray(a, np.int32)

    def u8(a):
        return np.ascontiguousarray(a, np.uint8)

    ry = i32(recon_y)
    rcb = i32(recon_cb) if recon_cb is not None else None
    rcr = i32(recon_cr) if recon_cr is not None else None
    cu = [i32(info.cu_x0), i32(info.cu_y0), i32(info.cu_w),
          i32(info.cu_h)]
    flags = [u8(info.is_intra), u8(info.cbf_y), u8(info.cbf_cb),
             u8(info.cbf_cr)]
    mv = i32(info.mv)
    refp = i32(info.ref_poc)
    mv1 = i32(info.mv1) if info.mv1 is not None else None
    refp1 = i32(info.ref_poc1) if info.ref_poc1 is not None else None
    tu = [i32(info.tu_x0) if info.tu_x0 is not None else None,
          i32(info.tu_y0) if info.tu_y0 is not None else None,
          i32(info.tu_w) if info.tu_w is not None else None,
          i32(info.tu_h) if info.tu_h is not None else None]
    sub = u8(info.sub_pu) if info.sub_pu is not None else None
    qpm = i32(info.qp_map) if getattr(info, "qp_map", None) is not None \
        else None
    ctab = i32(info.chroma_tab) \
        if getattr(info, "chroma_tab", None) is not None else None
    isp = u8(info.isp) if info.isp is not None else None

    def P(a, typ=ctypes.c_int32):
        return a.ctypes.data_as(ctypes.POINTER(typ)) \
            if a is not None else None

    rc = lib.lf_deblock_frame(
        P(ry), P(rcb), P(rcr), H, W,
        P(cu[0]), P(cu[1]), P(cu[2]), P(cu[3]),
        P(flags[0], ctypes.c_uint8), P(flags[1], ctypes.c_uint8),
        P(flags[2], ctypes.c_uint8), P(flags[3], ctypes.c_uint8),
        P(mv), P(refp), P(mv1), P(refp1),
        1 if info.slice_is_b and mv1 is not None else 0,
        P(tu[0]), P(tu[1]), P(tu[2]), P(tu[3]),
        P(sub, ctypes.c_uint8), P(qpm), P(ctab),
        P(isp, ctypes.c_uint8),
        int(qp), int(qp_c), int(bit_depth), int(ctu_size))
    if rc != 0:
        return False
    recon_y[:] = ry
    if recon_cb is not None:
        recon_cb[:] = rcb
    if recon_cr is not None:
        recon_cr[:] = rcr
    return True


def cabac_exec_live(enc, ops: np.ndarray) -> None:
    """Execute an op stream against a LIVE codec.cabac.CabacEncoder:
    arithmetic state and context bank resume and update in place,
    payload bytes append to enc.out — bit-identical to feeding the
    ops through the Python engine, at native speed (the RD trial-
    coding splice)."""
    lib = get_lib()
    ops = np.ascontiguousarray(ops, np.uint32)
    bank = enc.ctx
    n_ctx = len(bank.state0)
    st = np.array([enc.low, enc.range, enc.buffered_byte,
                   enc.num_buffered_bytes, enc.bits_left], np.int64)
    out = np.zeros(len(ops) // 2 + 4096, np.uint8)
    n = lib.cabac_exec(
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(ops),
        bank.state0.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        bank.state1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        bank.rate.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_ctx, st.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert n >= 0, f"native cabac_exec error {n}"
    enc.low = int(st[0])
    enc.range = int(st[1])
    enc.buffered_byte = int(st[2])
    enc.num_buffered_bytes = int(st[3])
    enc.bits_left = int(st[4])
    if n:
        enc.out.extend(out[:n].tobytes())


def cabac_run(ops: np.ndarray, bank) -> tuple[bytes, tuple[int, int]]:
    """Execute an op stream against a codec.cabac.ContextBank (states
    updated in place). -> (payload bytes, (tail_val, tail_bits))."""
    lib = get_lib()
    assert lib is not None, "native cabac unavailable"
    ops = np.ascontiguousarray(ops, np.uint32)
    n_ctx = len(bank.state0)
    s0 = np.ascontiguousarray(bank.state0, np.uint16)
    s1 = np.ascontiguousarray(bank.state1, np.uint16)
    rate = np.ascontiguousarray(bank.rate, np.uint8)
    out = np.zeros(len(ops) // 2 + 4096, np.uint8)
    tail = np.zeros(2, np.uint32)
    n = lib.cabac_run(
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(ops),
        s0.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        s1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        rate.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_ctx,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    assert n >= 0, f"native cabac error {n}"
    bank.state0[:] = s0
    bank.state1[:] = s1
    return bytes(out[:n]), (int(tail[0]), int(tail[1]))


# ---------------------------------------------------------------------------
# commit kernel (native intra leaf evaluation — commit_kernel.c)

_ck_ready = False

# MTS kind mapping matches commit_kernel.c (K_DCT2=0, K_DCT8=1, K_DST7=2)
# == ops/transforms.py DCT2/DCT8/DST7 constants.


def _ck():
    """Library with transform matrices installed, or None."""
    global _ck_ready
    lib = get_lib()
    if lib is None:
        return None
    if not _ck_ready:
        from ..ops import rom
        parts = [np.asarray(rom.trans_matrix("DCT2", s), np.int32).ravel()
                 for s in (4, 8, 16, 32, 64)]
        parts += [np.asarray(rom.trans_matrix("DST7", s), np.int32).ravel()
                  for s in (4, 8, 16, 32)]
        parts += [np.asarray(rom.trans_matrix("DCT8", s), np.int32).ravel()
                  for s in (4, 8, 16, 32)]
        buf = np.ascontiguousarray(np.concatenate(parts), np.int32)
        lib.ck_init(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    len(buf))
        assert lib.ck_ready(), "commit kernel matrix install failed"
        _ck_ready = True
    return lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def eval_intra(org, recon, coded, x, y, w, h, mode, qp_eff, bd, lam,
               is_irap=False, mts_allowed=False, ts_allowed=False,
               mrl=0, xmax=None, sdh=False):
    """Native _eval_intra_mode core (luma, scalar quant + optional
    sign-data hiding): refs -> predict -> (MTS/TS trials) ->
    T/Q[/SDH]/IQ/IT -> recon block.
    -> (q [h,w], recon [h,w], cbf, mts_idx, ts, ssd)."""
    lib = _ck()
    gh, gw = coded.shape
    q = np.empty((h, w), np.int32)
    rec = np.empty((h, w), np.int32)
    meta = np.zeros(3, np.int32)
    ssd = np.zeros(1, np.float64)
    flags = (1 if is_irap else 0) | ((1 if mts_allowed else 0) << 1) \
        | ((1 if ts_allowed else 0) << 2) | ((1 if sdh else 0) << 3)
    lib.ck_eval_intra(
        _i32p(org), _i32p(recon), org.shape[1], org.shape[0],
        coded.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), gw, gh,
        x, y, w, h, mode, mrl, qp_eff, bd, flags,
        -1 if xmax is None else int(xmax), float(lam),
        _i32p(q), _i32p(rec), _i32p(meta),
        ssd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return (q, rec, bool(meta[0]), int(meta[1]), bool(meta[2]),
            float(ssd[0]))


def eval_chroma(org_cb, org_cr, rec_cb, rec_cr, recon_y, coded,
                x, y, w, h, luma_mode, qp_c, bd, lam, is_irap=False,
                sdh=False, joint_cbcr=False, cclm=False, xmax=None,
                ctu_size=64, lmcs_scale=None):
    """Native _best_chroma_intra (chroma_kernel.c): DM vs CCLM/MDLM by
    RD proxy, with joint-CbCr ICT and LMCS chroma residual scaling.
    -> (outs, chroma_mode, joint_mask) in the encoder's format:
    outs = [(q_or_None, recon, cbf, ssd) x2], chroma_mode = "dm" | LM
    mode int."""
    lib = _ck()
    gh, gw = coded.shape
    Hc, Wc = rec_cb.shape
    hc, wc = h // 2, w // 2
    q_cb = np.empty((hc, wc), np.int32)
    q_cr = np.empty((hc, wc), np.int32)
    orec_cb = np.empty((hc, wc), np.int32)
    orec_cr = np.empty((hc, wc), np.int32)
    meta = np.zeros(6, np.int32)
    ssds = np.zeros(2, np.float64)
    flags = ((1 if is_irap else 0) | ((1 if sdh else 0) << 1)
             | ((1 if joint_cbcr else 0) << 2)
             | ((1 if cclm else 0) << 3))
    lib.ck_eval_chroma(
        _i32p(org_cb), _i32p(org_cr), _i32p(rec_cb), _i32p(rec_cr),
        Wc, Hc, _i32p(recon_y), recon_y.shape[1], recon_y.shape[0],
        coded.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), gw, gh,
        x, y, w, h, int(luma_mode), int(qp_c), bd, flags,
        -1 if xmax is None else int(xmax), int(ctu_size),
        0 if lmcs_scale is None else int(lmcs_scale), float(lam),
        _i32p(q_cb), _i32p(q_cr), _i32p(orec_cb), _i32p(orec_cr),
        _i32p(meta), ssds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    outs = [(q_cb if meta[4] else None, orec_cb, bool(meta[2]),
             float(ssds[0])),
            (q_cr if meta[5] else None, orec_cr, bool(meta[3]),
             float(ssds[1]))]
    mode = "dm" if meta[0] == 0 else int(meta[0])
    return outs, mode, int(meta[1])


def pair_eval(blk_cb, pred_cb, blk_cr, pred_cr, qp_c, bd, lam,
              is_irap=False, sdh=False, joint_cbcr=False,
              intra_cu=False, lmcs_scale=None):
    """Native _chroma_pair_eval twin over explicit block/pred arrays
    (inter chroma path). -> (outs, joint_mask)."""
    lib = _ck()
    hc, wc = blk_cb.shape
    q_cb = np.empty((hc, wc), np.int32)
    q_cr = np.empty((hc, wc), np.int32)
    orec_cb = np.empty((hc, wc), np.int32)
    orec_cr = np.empty((hc, wc), np.int32)
    meta = np.zeros(6, np.int32)
    ssds = np.zeros(2, np.float64)
    flags = ((1 if is_irap else 0) | ((1 if sdh else 0) << 1)
             | ((1 if joint_cbcr else 0) << 2)
             | ((1 if intra_cu else 0) << 3))
    bcb = np.ascontiguousarray(blk_cb, np.int32)
    pcb = np.ascontiguousarray(pred_cb, np.int32)
    bcr = np.ascontiguousarray(blk_cr, np.int32)
    pcr = np.ascontiguousarray(pred_cr, np.int32)
    lib.ck_pair_eval(
        _i32p(bcb), _i32p(pcb), _i32p(bcr), _i32p(pcr),
        wc, hc, int(qp_c), bd, flags,
        0 if lmcs_scale is None else int(lmcs_scale), float(lam),
        _i32p(q_cb), _i32p(q_cr), _i32p(orec_cb), _i32p(orec_cr),
        _i32p(meta), ssds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    outs = [(q_cb if meta[4] else None, orec_cb, bool(meta[2]),
             float(ssds[0])),
            (q_cr if meta[5] else None, orec_cr, bool(meta[3]),
             float(ssds[1]))]
    return outs, int(meta[1])


def mode_sads(org, recon, coded, x, y, w, h, bd, modes, xmax=None):
    """Native candidate screening: predict each mode and SAD it against
    the org block. -> (preds [n,h,w], sads [n])."""
    lib = _ck()
    gh, gw = coded.shape
    m = np.ascontiguousarray(modes, np.int32)
    preds = np.empty((len(m), h, w), np.int32)
    sads = np.empty(len(m), np.int64)
    lib.ck_mode_sads(
        _i32p(org), _i32p(recon), org.shape[1], org.shape[0],
        coded.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), gw, gh,
        x, y, w, h, bd, -1 if xmax is None else int(xmax),
        _i32p(m), len(m), _i32p(preds),
        sads.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return preds, sads


def dq_trellis(qf_scan: np.ndarray, sgn_scan: np.ndarray, step: int,
               qshift: int, err_norm: float, lam: float) -> np.ndarray:
    """4-state Viterbi dependent-quant level decision (depquant.c).
    qf_scan: int64 scaled |coeff| in scan order. -> signed levels in
    scan order (int32)."""
    lib = get_lib()
    assert lib is not None
    qf = np.ascontiguousarray(qf_scan, np.int64)
    sg = np.ascontiguousarray(sgn_scan, np.int32)
    out = np.zeros(len(qf), np.int32)
    r = lib.dq_trellis(
        qf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _i32p(sg),
        len(qf), step, qshift, err_norm, lam, _i32p(out))
    assert r >= -1, f"dq_trellis error {r}"
    return out


class OpRecorder:
    """Drop-in for codec.cabac.CabacEncoder that records ops instead of
    encoding; execute later with cabac_run. Interface subset used by the
    syntax writers. Bulk native-generated op arrays are appended with
    extend_ops (zero-copy until to_array)."""

    K_CTX, K_EP, K_EPS, K_TRM = 0 << 28, 1 << 28, 2 << 28, 3 << 28

    def __init__(self):
        self._parts: list[np.ndarray] = []
        self._cur: list[int] = []

    def encode_bin(self, bin_, ctx_id):
        self._cur.append(self.K_CTX | (ctx_id << 1) | bin_)

    def encode_bin_ep(self, bin_):
        self._cur.append(self.K_EP | bin_)

    def encode_bins_ep(self, bins, num_bins):
        # split >20-bit payloads (op format limit)
        while num_bins > 20:
            num_bins -= 20
            self._cur.append(self.K_EPS | (20 << 20)
                             | ((bins >> num_bins) & 0xFFFFF))
            bins &= (1 << num_bins) - 1
        self._cur.append(self.K_EPS | (num_bins << 20) | bins)

    def encode_bin_trm(self, bin_):
        self._cur.append(self.K_TRM | bin_)

    def extend_ops(self, arr: np.ndarray):
        if self._cur:
            self._parts.append(np.asarray(self._cur, np.uint32))
            self._cur = []
        self._parts.append(arr)

    def to_array(self) -> np.ndarray:
        parts = list(self._parts)
        if self._cur:
            parts.append(np.asarray(self._cur, np.uint32))
        if not parts:
            return np.empty(0, np.uint32)
        return np.concatenate(parts)
