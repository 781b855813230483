"""Device-mesh construction for the sharded calling pipeline.

The genome is the sequence axis; the real pipeline shards it over a 2-D
``(dp, sp)`` mesh — ``dp`` strides genome tiles (the reference's
per-chromosome/sub-region fork parallelism, src/GROM.c:354-624, re-expressed
as data parallelism), ``sp`` strides segments within a tile (the reference's
sliding-window memory trick, src/GROM.c:5846-6402, re-expressed as sequence
parallelism). The sharded step itself — real per-chromosome tensors, an
all_gather'd cross-cell depth carry and a psum'd global histogram — lives in
grom_tpu/parallel/pipeline.py.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def make_mesh(n_dp: int, n_sp: int, devices=None) -> Mesh:
    import jax
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_sp, "not enough devices"
    arr = np.array(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(arr, ("dp", "sp"))
