"""Background memory pre-acquisition for sandboxed kernels.

On gVisor-class kernels (this dev host included) a first-touch page fault
costs ~14s per GiB of sys time — the sentry must acquire host memory — so
every phase of the pipeline pays a one-time tax proportional to its fresh
allocation footprint. Memory the process has touched ONCE is cheap to fault
again (~0.1s/GiB), which is why grom_tpu routes large numpy buffers through
the huge-page slab pool (native/grom_hugealloc.c): freed slabs are kept
mapped and re-carved warm.

This module pre-pays the acquisition cost: one daemon thread reserves a
slab of the pipeline's expected peak footprint into the pool
(_hugealloc.reserve, GIL released) while a core is otherwise idle, so the
compute phases carve warm slabs instead of faulting inline. THP (the
reserve uses 2 MiB-aligned MADV_HUGEPAGE maps) makes the reserve itself
~3x cheaper than naive touching.

Enabled only when a startup probe measures an expensive-fault kernel
(>1s/GiB); on normal kernels this module does nothing. The reference's C
design sidesteps the problem by never materializing large buffers (htslib
streams 64KB BGZF blocks, src/GROM.c:82-324); our vectorized design wants
the dense arrays.
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


def fault_cost_s_per_gib(probe_mb: int = 16) -> float:
    """Measured first-touch cost of this kernel (s/GiB), probed once.

    The probe buffer must bypass the slab pool (a recycled slab would
    measure warm-page speed), so it uses a raw anonymous mmap."""
    import mmap
    sz = probe_mb << 20
    buf = mmap.mmap(-1, sz)
    t0 = time.perf_counter()
    buf.write(b"\x00" * (1 << 20))
    for off in range(1 << 20, sz, 4096):
        buf[off] = 1
    dt = time.perf_counter() - t0
    buf.close()
    return dt * 1024.0 / probe_mb


def maybe_start(target_bytes: int, threshold_s_per_gib: float = 1.0
                ) -> Optional[threading.Event]:
    """Start the background reserve when the kernel's fault cost warrants
    it. Returns a stop Event (set it to halt early), or None when disabled
    (normal kernel, non-linux, GROM_TPU_PREFAULT=0, or no allocator)."""
    global _started
    if _started is not None:
        return _started
    if not sys.platform.startswith("linux"):
        return None
    if os.environ.get("GROM_TPU_PREFAULT", "1") == "0":
        return None
    try:
        from grom_tpu import _hugealloc
    except ImportError:
        return None
    try:
        cost = fault_cost_s_per_gib()
    except (MemoryError, OSError):
        return None
    if cost < threshold_s_per_gib:
        return None
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        # keep small allocations in one arena with a high trim threshold so
        # their pages stay faulted too
        libc.mallopt(_M_ARENA_MAX, 1)
        libc.mallopt(_M_TRIM_THRESHOLD, (1 << 31) - 1)
    except (OSError, AttributeError):
        pass

    stop = threading.Event()

    def work():
        # reserve in ~128MB slices so a stop request takes effect quickly
        done = 0
        while done < target_bytes and not stop.is_set():
            step = min(128 << 20, target_bytes - done)
            try:
                got = _hugealloc.reserve(step)
            except Exception:
                break
            if not got:
                break
            done += got

    t = threading.Thread(target=work, name="grom-prefault", daemon=True)
    t.start()
    _started = stop
    return stop
