"""Structured encode tracing (aux-subsystem parity with the
reference's CDTrace/dtrace channels, CommonLib/dtrace.h:96 and the
D_SYNTAX/D_MODE channel scheme, plus the Analyze.h per-slice-type
summary accounting).

Events are JSON lines `{"ch": ..., ...}` filtered by channel, so a
trace can be diffed, grepped, or loaded as a dataframe. The tracer is
process-global and null by default (zero overhead when disabled —
call sites guard on `trace.enabled(ch)`).

Channels:
  frame   per-picture results (type, bits, psnr)
  cu      per-CU committed decision (pos/size/kind/mode/mv/cbf)
  sao     per-frame SAO parameter summary
  rc      rate-control decisions (target/qp/achieved)
"""

from __future__ import annotations

import json
from typing import IO, Iterable, Optional

_tracer: Optional["Tracer"] = None


class Tracer:
    def __init__(self, fp: IO[str], channels: Iterable[str] | None = None):
        self.fp = fp
        self.channels = set(channels) if channels else None

    def wants(self, ch: str) -> bool:
        return self.channels is None or ch in self.channels

    def event(self, ch: str, **kw):
        if not self.wants(ch):
            return
        rec = {"ch": ch}
        rec.update(kw)
        self.fp.write(json.dumps(rec, separators=(",", ":")) + "\n")

    def close(self):
        self.fp.flush()


def set_tracer(t: Optional[Tracer]):
    global _tracer
    _tracer = t


def open_trace(path: str, channels: Iterable[str] | None = None) -> Tracer:
    t = Tracer(open(path, "w"), channels)
    set_tracer(t)
    return t


def enabled(ch: str) -> bool:
    return _tracer is not None and _tracer.wants(ch)


def event(ch: str, **kw):
    if _tracer is not None:
        _tracer.event(ch, **kw)
