"""Per-syntax-element bit accounting (debug/analysis subsystem).

Reference parity: VTM's CodingStatistics (CommonLib/CodingStatistics.h:50
STATS__* enum + the DecoderAnalyserApp builds, CMakeLists.txt:146-159)
attributes every coded bit to a syntax element so that rate anomalies
can be localized ("where did the bits go?"). The VTM version instruments
the decoder's read calls; here the encoder's final entropy pass already
materializes the whole slice as a flat CABAC *op stream*
(native.OpRecorder: ctx bins, EP bins, bypass runs), so accounting is a
post-pass over that stream — no instrumentation of the syntax writers.

Attribution:
  * context-coded bins map to a syntax-element name via the context-set
    layout in codec.ctx_ids (generated from VTM Contexts.cpp declaration
    order) — e.g. ctx 0..8 -> "SplitFlag", 90..149 -> "SigFlag".
  * equiprobable bins/runs and the terminating bin are attributed to
    the most recent context-coded element (EP payloads — coeff
    remainders, sign bits, mvd suffixes, merge-idx tails — always
    directly follow their element's ctx-coded prefix in VVC syntax).

Costs are the estimator's fractional bits (bitest.frac_bits_table — the
same -log2(p) model VTM's CABACEstimator uses) with full context
adaptation, so the per-element sum tracks the true arithmetic-coded
payload length closely (exact for EP bins, within the usual <0.5%
estimator gap for ctx bins).
"""

from __future__ import annotations

import functools

import numpy as np

from ..codec import cabac, ctx_ids
from ..codec.bitest import SCALE_BITS, frac_bits_table


@functools.lru_cache(maxsize=1)
def element_map() -> tuple[np.ndarray, list[str]]:
    """-> ([NUM_CTX] int32 element index per context, element names).

    Derived from codec.ctx_ids: every public tuple (offset, n) or list
    of tuples names one syntax element's context set(s)."""
    names: list[str] = []
    idx = np.full(ctx_ids.NUM_CTX, -1, np.int32)
    for name in dir(ctx_ids):
        if name.startswith("_") or name == "NUM_CTX":
            continue
        val = getattr(ctx_ids, name)
        spans = []
        if isinstance(val, tuple) and len(val) == 2 \
                and all(isinstance(v, int) for v in val):
            spans = [val]
        elif isinstance(val, list) and val \
                and all(isinstance(v, tuple) and len(v) == 2
                        for v in val):
            spans = val
        else:
            continue
        ei = len(names)
        names.append(name)
        for off, n in spans:
            idx[off:off + n] = ei
    names.append("(unnamed)")
    idx[idx < 0] = len(names) - 1
    return idx, names


def account_ops(ops: np.ndarray, bank: cabac.ContextBank) -> dict:
    """Account a recorded CABAC op stream (native.OpRecorder.to_array
    format) against an initial context bank -> {element: bits}.

    `bank` must hold the slice-start states (it is consumed: contexts
    adapt exactly as the engine would). EP/terminate bins fold into the
    most recent ctx element ("(header)" before the first ctx bin)."""
    emap, names = element_map()
    tab = frac_bits_table()
    s0 = bank.state0.astype(np.int64)
    s1 = bank.state1.astype(np.int64)
    r0 = (bank.rate >> 4).astype(np.int64)
    r1 = (bank.rate & 15).astype(np.int64)
    m0, m1 = cabac.MASK_0, cabac.MASK_1
    frac = np.zeros(len(names) + 1, np.int64)   # +1: "(header)" slot
    hdr = len(names)
    cur = hdr
    K = 0x0FFFFFFF
    for op in np.asarray(ops, np.uint32).tolist():
        kind = op >> 28
        if kind == 0:                            # ctx-coded bin
            ctx = (op & K) >> 1
            b = op & 1
            q = int(s0[ctx] + s1[ctx]) >> 8
            cur = emap[ctx]
            frac[cur] += tab[q, b]
            s0[ctx] -= (s0[ctx] >> r0[ctx]) & m0
            s1[ctx] -= (s1[ctx] >> r1[ctx]) & m1
            if b:
                s0[ctx] += (0x7FFF >> r0[ctx]) & m0
                s1[ctx] += (0x7FFF >> r1[ctx]) & m1
        elif kind == 1:                          # single EP bin
            frac[cur] += 1 << SCALE_BITS
        elif kind == 2:                          # EP run
            frac[cur] += ((op >> 20) & 0xFF) << SCALE_BITS
        else:                                    # terminating bin
            frac[cur] += 1 << SCALE_BITS
    out = {}
    for i, n in enumerate(names):
        if frac[i]:
            out[n] = frac[i] / float(1 << SCALE_BITS)
    if frac[hdr]:
        out["(pre-ctx)"] = frac[hdr] / float(1 << SCALE_BITS)
    return out


def format_report(acct: dict, payload_bits: int | None = None) -> str:
    """Human-readable table, largest consumers first (the
    DecoderAnalyserApp-style summary)."""
    total = sum(acct.values())
    lines = ["%-24s %12s %7s" % ("syntax element", "bits", "share")]
    for k in sorted(acct, key=acct.get, reverse=True):
        lines.append("%-24s %12.1f %6.2f%%"
                     % (k, acct[k], 100.0 * acct[k] / max(total, 1e-9)))
    lines.append("%-24s %12.1f" % ("TOTAL (estimated)", total))
    if payload_bits is not None:
        lines.append("%-24s %12d" % ("payload (actual)", payload_bits))
    return "\n".join(lines)
