"""Background heap pre-faulting for sandboxed kernels.

On gVisor-class kernels (this dev host included) a first-touch page fault
costs ~5-6s per GiB of sys time, so every phase of the pipeline pays a
one-time tax proportional to its fresh allocation footprint — the measured
steady-state compute of e.g. build_batch is 0.3s but its first call on a
2.4M-read chromosome costs 4s. The reference's C design sidesteps this by
never materializing large buffers (htslib streams 64KB BGZF blocks,
src/GROM.c:82-324); our vectorized design wants the dense arrays.

Fix: one daemon thread touches heap pages AHEAD of the compute phases while
a core is otherwise idle (the single-threaded Python phases leave one of the
host's cores free). Combined with a single malloc arena (so helper-thread
pages land in the same arena the pipeline allocates from) and a high trim
threshold (so freed pages stay faulted), later allocations reuse warm pages
at memory bandwidth.

Enabled only when a startup probe measures an expensive-fault kernel
(>1s/GiB); on normal kernels this module does nothing.
"""

from __future__ import annotations

import ctypes
import os
import sys
import threading
import time
from typing import Optional

import numpy as np

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_ARENA_MAX = -8

_started: Optional[threading.Event] = None


def fault_cost_s_per_gib() -> float:
    """Measured first-touch cost of this kernel (s/GiB), probed once."""
    a = np.empty(64 << 20, np.uint8)
    t0 = time.perf_counter()
    a.fill(0)
    dt = time.perf_counter() - t0
    del a
    return dt * 16.0


def maybe_start(target_bytes: int, threshold_s_per_gib: float = 1.0
                ) -> Optional[threading.Event]:
    """Start the prefault thread when the kernel's fault cost warrants it.

    Returns a stop Event (set it to halt early), or None when disabled
    (normal kernel, non-linux, or GROM_TPU_PREFAULT=0)."""
    global _started
    if _started is not None:
        return _started
    if not sys.platform.startswith("linux"):
        return None
    if os.environ.get("GROM_TPU_PREFAULT", "1") == "0":
        return None
    try:
        cost = fault_cost_s_per_gib()
    except MemoryError:
        return None
    if cost < threshold_s_per_gib:
        return None
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        # helper-thread pages must land in the arena the pipeline mallocs
        # from; glibc otherwise gives each thread its own arena
        libc.mallopt(_M_ARENA_MAX, 1)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, (1 << 31) - 1)
    except (OSError, AttributeError):
        return None

    stop = threading.Event()

    def work():
        chunk = 128 << 20
        held = []
        total = 0
        while total < target_bytes and not stop.is_set():
            try:
                a = np.empty(chunk, np.uint8)
            except MemoryError:
                break
            a.fill(0)          # releases the GIL; faults the pages
            held.append(a)
            total += chunk
        held.clear()           # pages stay faulted (trim threshold)

    t = threading.Thread(target=work, name="grom-prefault", daemon=True)
    t.start()
    _started = stop
    return stop
