"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware."""

import os
import sys

# Hard override: the environment pins JAX_PLATFORMS=axon (single real TPU);
# tests exercise sharding on a virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
# Dev-harness tunnel hooks must not reach test processes: the axon
# sitecustomize can route XLA compiles over the TPU tunnel
# (PALLAS_AXON_REMOTE_COMPILE), and a stalled tunnel then blocks a CPU-mesh
# compile forever in recvfrom (observed: 10Mb mesh test hung ~1h at 0% CPU)
for _k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
           "AXON_LOOPBACK_RELAY"):
    os.environ.pop(_k, None)
# Synchronous CPU dispatch: XLA's async CPU runner intermittently loses a
# wakeup on this 2-vCPU host with 8 forced devices (mesh tests deadlock at
# 0% CPU inside batched_device_put waiting on a prior pjit; 3/3 repros on
# the 10Mb mesh test). Dispatch latency is irrelevant for tests.
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
