"""Structured stage tracing (the TPU-native analog of the reference's
ark_std start_timer!/end_timer!, /root/reference/src/sumcheck/utils.rs:88-94).

Disabled unless ZINC_TPU_TRACE is set; with ZINC_TPU_TRACE=1 every
start/end pair prints one line with the wall time:

    [zinc-tpu] spartan.sumcheck1 ........ 1.234 s

Timers nest; the indent tracks depth.  `timed` is the context-manager form.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_depth = 0


def _enabled() -> bool:
    return bool(os.environ.get("ZINC_TPU_TRACE"))


def start_timer(label: str):
    """Returns an opaque handle for end_timer (None when tracing is off)."""
    global _depth
    if not _enabled():
        return None
    handle = (label, time.perf_counter(), _depth)
    _depth += 1
    return handle


def end_timer(handle) -> None:
    global _depth
    if handle is None:
        return
    label, t0, depth = handle
    _depth = depth
    dt = time.perf_counter() - t0
    dots = "." * max(2, 40 - 2 * depth - len(label))
    print(f"[zinc-tpu] {'  ' * depth}{label} {dots} {dt:.3f} s", file=sys.stderr)


@contextlib.contextmanager
def timed(label: str):
    h = start_timer(label)
    try:
        yield
    finally:
        end_timer(h)
