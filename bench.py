#!/usr/bin/env python
"""Benchmark: per-base pileup + SNV-scoring inner-loop throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is aligned-bases/s through the device pileup+scoring pipeline
(the reference's hot loops 1-2, SURVEY §3.1). vs_baseline compares against
the reference binary's single-thread whole-pipeline throughput measured on
this host (the reference has no published numbers — SURVEY §6); when the
binary is unavailable a recorded constant from this machine is used.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# measured on this host: reference GROM 1.0.1 single-thread end-to-end on the
# 400kb synthetic dataset (239k reads / 23.9M aligned bases in 5.9s)
REFERENCE_BASES_PER_S = 4.05e6


def measure_reference() -> float:
    """Time the reference binary end-to-end if available; bases/s."""
    try:
        from grom_tpu.testing.oracle import oracle_available, run_oracle
        from grom_tpu.testing.simulate import SimConfig, quick_dataset
        if not oracle_available():
            return REFERENCE_BASES_PER_S
        import tempfile
        d = tempfile.mkdtemp(prefix="grom_bench_")
        fa, bam, _ = quick_dataset(os.path.join(d, "ds"), length=300_000,
                                   seed=42, sim=SimConfig(coverage=30.0, seed=43))
        t0 = time.time()
        r = run_oracle(bam, fa, os.path.join(d, "out.vcf"))
        dt = time.time() - t0
        if r.returncode != 0:
            return REFERENCE_BASES_PER_S
        from grom_tpu.ingest.bam import read_bam
        _, reads = read_bam(bam, want_names=False)
        bases = int(reads.lseq.sum())
        return bases / dt
    except Exception:
        return REFERENCE_BASES_PER_S


def measure_device() -> float:
    import jax
    import jax.numpy as jnp

    from grom_tpu.ops.pileup import (PileupEvents, SnvParams,
                                     pileup_tile_presorted, snv_detect_tile,
                                     span_depth_tile)
    from grom_tpu.stats import binom

    TILE = 1 << 18
    E = 1 << 21          # aligned-base events per step
    NBATCH = 2           # distinct resident batches to defeat caching
    rng = np.random.default_rng(0)

    params = SnvParams(
        mq_table=jnp.asarray(binom.build_mq_table(20), jnp.float32),
        hez_table=jnp.asarray(binom.build_hez_table(), jnp.float32),
        ref_code=jnp.asarray(rng.integers(0, 4, TILE), jnp.int8),
        min_snv_ratio=0.2, min_snv=3, min_ave_bq=15.0,
    )

    def make_batch(seed):
        r = np.random.default_rng(seed)
        mapq = np.full(E, 60, np.int64)
        lowsel = r.random(E) < 0.02
        mapq[lowsel] = 10
        ev = PileupEvents(
            pos=jnp.asarray(np.sort(r.integers(0, TILE, E)), jnp.int32),
            code=jnp.asarray(r.integers(0, 4, E), jnp.int8),
            qual=jnp.asarray(r.integers(15, 40, E), jnp.int32),
            mapq=jnp.asarray(mapq, jnp.int32),
            is_hi=jnp.asarray(r.random(E) < 0.95),
            counted=jnp.asarray(np.ones(E, bool)),
            mismatch=jnp.asarray(r.random(E) < 0.01),
            fwd=jnp.asarray(r.random(E) < 0.5),
            pir=jnp.asarray(r.integers(0, 150, E), jnp.int32),
        )
        s = jnp.asarray(np.sort(r.integers(0, TILE - 400, E // 8)), jnp.int32)
        return ev, s, s + 300, jnp.ones(E // 8, jnp.int32)

    batches = [make_batch(i) for i in range(NBATCH)]
    for b in batches:
        jax.block_until_ready(b)

    @jax.jit
    def step(ev, ss, se, sw, params):
        tile = pileup_tile_presorted(ev, TILE)
        depth = span_depth_tile(ss, se, sw, TILE)
        cand, best, ratio, bn, hez = snv_detect_tile(tile, params, depth > 0)
        return cand.sum(), bn.sum(), depth.sum()

    # warmup/compile
    out = step(*batches[0], params)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.time()
    acc = None
    for i in range(iters):
        acc = step(*batches[i % NBATCH], params)
    jax.block_until_ready(acc)
    dt = (time.time() - t0) / iters
    return E / dt


def main():
    dev = measure_device()
    ref = measure_reference()
    print(json.dumps({
        "metric": "pileup_scoring_bases_per_s",
        "value": round(dev, 1),
        "unit": "aligned bases/s/chip",
        "vs_baseline": round(dev / ref, 2),
    }))


if __name__ == "__main__":
    main()
