"""Worker process for tests/test_multihost.py: one of N jax.distributed
processes, each owning 2 virtual CPU devices, running the REAL sharded
calling step (parallel/pipeline.py) over the GLOBAL 2-host mesh on the
ds200k fixture, and checking the result against the local host engines.

This exercises the DCN layer the reference lacks entirely (its multi-"host"
story is fork + files, src/GROM.c:354-624): inputs are materialized
shard-wise per process, the depth-carry all_gather and the histogram psum
cross the process boundary, and outputs are re-assembled with a cross-host
allgather.

Usage: multihost_worker.py <pid> <nprocs> <port>
Prints MULTIHOST_OK on success."""

import os
import sys

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=n,
                           process_id=pid)
assert jax.process_count() == n, jax.process_count()
assert len(jax.devices()) == 2 * n, len(jax.devices())

from grom_tpu.call import scan as scan_mod  # noqa: E402
from grom_tpu.parallel.mesh import make_mesh  # noqa: E402
from grom_tpu.parallel.pipeline import HIST_BINS, MeshAccumulator  # noqa: E402
from grom_tpu.testing.fixtures import chrom_inputs  # noqa: E402

data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "ds200k")
ci = chrom_inputs(data)

# dp axis spans the two processes (jax.devices() is process-major)
mesh = make_mesh(n, 2, devices=jax.devices())
acc = MeshAccumulator(mesh=mesh)
assert acc.multihost
res = acc.run(ci.chrom, ci.batch, ci.eligible, ci.cfg, ci.gate)
assert res is not None
base_tot, dev_cand, (rd_mq, rd_hi, rd_lo), hist = res

arr = scan_mod.accumulate_chromosome(ci.chrom, ci.batch, ci.cfg, ci.drv,
                                     ci.scan_start)
base_host = (arr.snv.sum(axis=0) + arr.snv_lowmq.sum(axis=0)).astype(np.int64)
assert np.array_equal(base_tot, base_host), "base_tot mismatch"
assert np.array_equal(rd_mq, arr.rd_mq), "rd_mq mismatch"
assert np.array_equal(rd_hi, arr.rd_hi), "rd_hi mismatch"
assert np.array_equal(rd_lo, arr.rd_lo), "rd_lo mismatch"
hist_host = np.bincount(np.clip(arr.rd_hi, 0, HIST_BINS - 1),
                        minlength=HIST_BINS).astype(np.int64)
assert np.array_equal(hist, hist_host), "psum'd histogram mismatch"
assert dev_cand["n"] > 0, "no SNV candidates crossed the DCN boundary"
print(f"MULTIHOST_OK pid={pid} cands={dev_cand['n']}", flush=True)
