"""grom_tpu — a TPU-native integrated germline variant caller.

Reimplements the capabilities of GROM (radygenomics/GROM: SNVs, small indels,
structural variants, CNVs and translocations from coordinate-sorted paired-end
BAMs) as an idiomatic JAX/XLA/Pallas engine: host-side BAM→tensor ingest,
vectorized pileup/evidence kernels over HBM-resident genome tiles, and
mesh-sharded multi-chip execution.
"""

def _tune_malloc() -> None:
    """Keep glibc from mmap()ing every large numpy buffer. The pileup path
    allocates/frees tens of ~50MB arrays per chromosome; with the default
    mmap threshold each one is a fresh anonymous mapping whose pages fault
    on first touch (and on some hosts that costs seconds per call). Raising
    M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes the heap retain and reuse those
    pages. Measured ~2x end-to-end on the 200kb fixture. No-op off glibc."""
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        one_gib = 1 << 30
        libc.mallopt(M_MMAP_THRESHOLD, one_gib)
        libc.mallopt(M_TRIM_THRESHOLD, one_gib)
    except (OSError, AttributeError):
        pass


_tune_malloc()


def _install_hugealloc() -> None:
    """Route large numpy allocations through the huge-page slab allocator
    (native/grom_hugealloc.c). On sandboxed kernels (gVisor-class TPU dev
    hosts) a first-touch page fault costs ~14 s/GiB; 2 MiB-aligned
    MADV_HUGEPAGE mmaps cut that ~3x and the allocator's warm-slab reuse
    cuts it ~100x, which is the difference between memory allocation and
    compute dominating the pipeline. Disable with GROM_TPU_HUGEALLOC=0.
    The extension is built on demand (make -C native hugealloc)."""
    import os
    import sys
    if not sys.platform.startswith("linux"):
        return
    if os.environ.get("GROM_TPU_HUGEALLOC", "1") == "0":
        return
    try:
        from grom_tpu import _hugealloc
    except ImportError:
        import subprocess
        src_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "native")
        if not os.path.exists(os.path.join(src_dir, "grom_hugealloc.c")):
            return
        try:
            r = subprocess.run(["make", "-C", src_dir, "-s", "hugealloc"],
                               capture_output=True, timeout=120)
            if r.returncode != 0:
                return
            from grom_tpu import _hugealloc
        except Exception:
            return
    try:
        _hugealloc.install()
    except Exception:
        pass


_install_hugealloc()

from grom_tpu.config import DerivedConfig, GromConfig  # noqa: E402

__version__ = "0.1.0"

__all__ = ["GromConfig", "DerivedConfig", "__version__"]
