"""Device kernels: equivalence with the host parity engine + mesh dry run."""

import numpy as np
import pytest


def _jax():
    import jax
    return jax


def test_pileup_matches_host_engine():
    """Device pileup on real fixture events == host numpy accumulation."""
    import os

    import jax.numpy as jnp

    from grom_tpu.call import scan as SC
    from grom_tpu.config import DerivedConfig, GromConfig
    from grom_tpu.driver import _subset_reads
    from grom_tpu.ingest import bam as B
    from grom_tpu.ingest import fasta as F
    from grom_tpu.ingest.batches import build_batch, expand_spans
    from grom_tpu.ingest.insert_size import load_or_estimate
    from grom_tpu.ops.pileup import PileupEvents, pileup_tile_presorted

    d = os.path.join(os.path.dirname(__file__), "data", "dup60k")
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"), out_vcf="/tmp/x.vcf")
    info = F.index_fasta(cfg.ref_fasta)
    hdr, reads = B.read_bam(cfg.bam)
    ins = load_or_estimate(cfg.bam, reads, cfg, use_cache=False)
    drv = DerivedConfig.from_insert_stats(cfg, ins.insert_mean, ins.insert_min,
                                          ins.insert_max, ins.read_len,
                                          ins.mapped_read_bases)
    chrom = F.load_chromosome(cfg.ref_fasta, info, info.names[0])
    sub = _subset_reads(reads, np.flatnonzero(reads.refid == 0))
    batch = build_batch(sub, 0, cfg.min_mapq, cfg.add_factor, False)
    ss, se, sk = SC.scan_bounds(cfg, drv, sub.pos)
    arr = SC.accumulate_chromosome(chrom, batch, cfg, drv, ss)

    # build device events replicating the host tally (without name dedup —
    # compare against a host accumulation with dedup disabled)
    rid, refpos, readidx = expand_spans(batch)
    elig = (batch.keep & (batch.pos >= ss))[rid]
    rid, refpos, readidx = rid[elig], refpos[elig], readidx[elig]
    inb = (refpos >= 0) & (refpos < len(chrom))
    rid, refpos, readidx = rid[inb], refpos[inb], readidx[inb]
    seq = sub.seq[sub.seq_off[rid] + readidx]
    code = np.full(len(seq), -1, np.int8)
    for i, ch in enumerate(b"ACGT"):
        code[seq == ch] = i
    qual = sub.qual[sub.seq_off[rid] + readidx].astype(np.int32)
    mapq = batch.mapq[rid]
    hi = (mapq >= cfg.min_mapq) & (qual >= cfg.min_base_qual)
    fwd = (batch.flag[rid] & 0x10) == 0
    ref_upper = np.where(chrom[refpos] >= 97, chrom[refpos] - 32, chrom[refpos])
    mismatch = ref_upper != seq
    lseq = batch.lseq[rid]
    pir = np.where(mismatch, readidx, np.where(fwd, readidx, lseq - readidx))

    order = np.argsort(refpos, kind="stable")
    T = len(chrom)
    ev = PileupEvents(
        pos=jnp.asarray(refpos[order], jnp.int32),
        code=jnp.asarray(code[order], jnp.int8),
        qual=jnp.asarray(qual[order], jnp.int32),
        mapq=jnp.asarray(mapq[order], jnp.int32),
        is_hi=jnp.asarray(hi[order]),
        counted=jnp.asarray(np.ones(len(order), bool)),
        mismatch=jnp.asarray(mismatch[order]),
        fwd=jnp.asarray(fwd[order]),
        pir=jnp.asarray(pir[order].astype(np.int32)),
    )
    import jax
    tile = jax.jit(pileup_tile_presorted, static_argnames=("tile_size",))(ev, T)

    # host accumulation with dedup disabled for comparison
    hi_i = np.flatnonzero(hi & (code >= 0))
    snv = np.zeros((4, T), np.int32)
    np.add.at(snv, (code[hi_i], refpos[hi_i]), 1)
    assert (np.asarray(tile.snv) == snv).all()
    lo_i = np.flatnonzero(~hi & (code >= 0))
    lowmq = np.zeros((4, T), np.int32)
    np.add.at(lowmq, (code[lo_i], refpos[lo_i]), 1)
    assert (np.asarray(tile.snv_lowmq) == lowmq).all()
    bq_all = np.zeros(T, np.int64)
    np.add.at(bq_all, refpos[hi_i], qual[hi_i])
    np.add.at(bq_all, refpos[lo_i], qual[lo_i])
    assert (np.asarray(tile.bq_all) == bq_all).all()


def test_span_depth_matches_numpy():
    import jax
    import jax.numpy as jnp

    from grom_tpu.ops.pileup import span_depth_tile

    rng = np.random.default_rng(0)
    T = 4096
    S = 500
    s = np.sort(rng.integers(0, T - 100, S)).astype(np.int32)
    ln = rng.integers(1, 100, S)
    e = (s + ln).astype(np.int32)
    order_e = np.argsort(e, kind="stable")
    w = np.ones(S, np.int32)

    depth = jax.jit(span_depth_tile, static_argnames=("tile_size",))(
        jnp.asarray(s), jnp.asarray(e[order_e]), jnp.asarray(w), T)
    ref = np.zeros(T, np.int64)
    for i in range(S):
        ref[s[i]:e[i]] += 1
    assert (np.asarray(depth) == ref).all()


def test_gc_weighted_matches_host():
    import jax
    import jax.numpy as jnp

    from grom_tpu.call.cnv import preprocess_reference
    from grom_tpu.ops.pileup import gc_weighted_tile

    rng = np.random.default_rng(1)
    chrom = rng.choice(list(b"ACGTN"), 4000).astype(np.uint8)
    m = 150
    feats = preprocess_reference(chrom, m, 20)
    up = np.frombuffer(chrom.tobytes().upper(), np.uint8)
    is_gc = (up == ord("C")) | (up == ord("G"))
    out = jax.jit(gc_weighted_tile, static_argnames=("insert_mean", "tile_pad"))(
        jnp.asarray(is_gc), m, m - 1)
    W = 2 * m - 1
    want = feats.gc_weighted[m - 1:len(chrom) - W]
    got = np.asarray(out)[: len(want)]
    assert (got == want).all()


def test_mesh_dryrun():
    """Run the multichip dry run in a subprocess with a virtual 8-device CPU
    mesh (the axon TPU plugin initializes jax during sitecustomize, so the
    platform can't be switched in-process)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multichip ok" in r.stdout
