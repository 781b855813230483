"""Persistent XLA compilation cache setup.

The device tile kernels (ops/accumulate.py, ops/pileup.py) compile once per
bucket shape; on TPU that compile is tens of seconds.  Because every bucket
is a fixed power-of-two, the executables are perfectly cacheable across
runs — enabling jax's persistent compilation cache makes every run after the
first start hot.  (The reference has the same pattern with its binomial
tables: built once, cached next to the binary, src/GROM.c:21331-21355.)
"""

from __future__ import annotations

import os

_done = False


def enable_persistent_cache() -> None:
    """Idempotently point jax at a persistent on-disk compilation cache.

    Directory: $GROM_TPU_JAX_CACHE, else ~/.cache/grom_tpu/jax.  Set
    GROM_TPU_JAX_CACHE=0 to disable.  Safe to call before or after other
    jax imports; never raises.
    """
    global _done
    if _done:
        return
    _done = True
    spec = os.environ.get("GROM_TPU_JAX_CACHE", "")
    if spec == "0":
        return
    path = spec or os.path.join(
        os.path.expanduser("~"), ".cache", "grom_tpu", "jax")
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, even quick compiles; a genome run re-enters the
        # same executables thousands of times across worker processes
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
