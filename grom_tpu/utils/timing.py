"""Phase timing instrumentation — the TPU-host equivalent of the reference's
``#ifdef DO_TIMING`` rdtsc spans (src/GROM.c:58-65, :1111-1121, and the
timers[] blocks around each scan phase, e.g. :5849-6400, :16628-17001).

Off by default; enable with GROM_TPU_TIMING=1 (or timing_enable()). Timers
nest freely and aggregate by label across calls; report() prints a sorted
table to stderr. Thread-safe for the multiprocessing driver: each process
reports its own table.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from contextlib import contextmanager
from typing import Dict, Iterator, Tuple

_lock = threading.Lock()
_totals: Dict[str, Tuple[float, int]] = {}
_enabled = os.environ.get("GROM_TPU_TIMING", "") == "1"


def timing_enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def timing_enabled() -> bool:
    return _enabled


@contextmanager
def phase(label: str) -> Iterator[None]:
    """Accumulate wall-clock time under ``label`` when timing is enabled."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            tot, n = _totals.get(label, (0.0, 0))
            _totals[label] = (tot + dt, n + 1)


def reset() -> None:
    with _lock:
        _totals.clear()


def report(file=None) -> Dict[str, Tuple[float, int]]:
    """Print the per-phase table (seconds, calls) sorted by total time and
    return a snapshot of it."""
    with _lock:
        snap = dict(_totals)
    if _enabled and snap:
        f = file or sys.stderr
        width = max(len(k) for k in snap)
        print("== grom_tpu timing ==", file=f)
        for k, (tot, n) in sorted(snap.items(), key=lambda kv: -kv[1][0]):
            print("%-*s %9.3fs  x%d" % (width, k, tot, n), file=f)
    return snap
