"""Differential tests: native CNV stages (native/grom_cnv.c) vs the numpy
implementations in call/cnv.py (themselves parity-tested against the
reference binary). The native path must be bit-identical — z-scores,
null-model window stdevs, and emitted call lists including last-ulp float
equality of the scores."""

import os

import numpy as np
import pytest

from grom_tpu.call import cnv as cnv_mod
from grom_tpu.config import DerivedConfig, GromConfig
from grom_tpu.ingest import bam as bam_mod
from grom_tpu.ingest import fasta as fasta_mod
from grom_tpu.ingest.batches import build_batch
from grom_tpu.ingest.insert_size import load_or_estimate

DATA = os.path.join(os.path.dirname(__file__), "data")


def _cnv_inputs(fixture):
    from grom_tpu.call import scan as scan_mod
    d = os.path.join(DATA, fixture)
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"),
                     out_vcf="/tmp/unused.vcf")
    info = fasta_mod.index_fasta(cfg.ref_fasta)
    _, reads = bam_mod.read_bam(cfg.bam)
    ins = load_or_estimate(cfg.bam, reads, cfg)
    drv = DerivedConfig.from_insert_stats(cfg, ins.insert_mean,
                                          ins.insert_min, ins.insert_max,
                                          ins.read_len,
                                          ins.mapped_read_bases)
    name = info.names[0]
    chrom = fasta_mod.load_chromosome(cfg.ref_fasta, info, name)
    sel = np.flatnonzero(reads.refid == 0)
    from grom_tpu.driver import _subset_reads
    sub = _subset_reads(reads, sel)
    batch = build_batch(sub, 0, cfg.min_mapq, cfg.add_factor, cfg.rmdup)
    scan_start, _, _ = scan_mod.scan_bounds(cfg, drv, sub.pos, 0)
    arr = scan_mod.accumulate_chromosome(chrom, batch, cfg, drv, scan_start)
    return chrom, arr, cfg, drv


def _calls(chrom, arr, cfg, drv, native: bool):
    orig = cnv_mod._native_cnv_ctx
    if not native:
        cnv_mod._native_cnv_ctx = lambda *a, **k: None
    try:
        ploidy = cfg.ploidy
        feats = cnv_mod.preprocess_reference(chrom, drv.insert_mean,
                                             cfg.min_repeat)
        prep = cnv_mod.prep_cnv(chrom, feats, arr.rd_hi, arr.rd_lo,
                                arr.rd_mq, cfg, drv)
        return cnv_mod.detect_del_dup(chrom, feats, prep, arr.rd_hi,
                                      arr.rd_lo, cfg, drv, ploidy)
    finally:
        cnv_mod._native_cnv_ctx = orig


def _native_available():
    from grom_tpu.native import get_lib
    lib = get_lib()
    return lib is not None and hasattr(lib, "gn_cnv_zscores")


@pytest.mark.parametrize("fixture", ["ds200k", "sv400k"])
def test_native_cnv_matches_numpy(fixture):
    if not _native_available():
        pytest.skip("native cnv kernels unavailable")
    if not os.path.exists(os.path.join(DATA, fixture, "ds.bam")):
        pytest.skip("fixture missing")
    chrom, arr, cfg, drv = _cnv_inputs(fixture)
    dn, pn = _calls(chrom, arr, cfg, drv, native=True)
    do, po = _calls(chrom, arr, cfg, drv, native=False)
    for nat, ora in ((dn, do), (pn, po)):
        assert len(nat) == len(ora)
        for a, b in zip(nat, ora):
            assert (a.start, a.end) == (b.start, b.end)
            assert a.stdev == b.stdev          # bitwise float equality
            assert a.cn == b.cn
            assert a.cn_stdev == b.cn_stdev


@pytest.mark.parametrize("ranks", [0, 1])
def test_native_cnv_matches_numpy_synthetic(ranks):
    """Randomized synthetic chromosome: exercises sparse bins, the ±2-bin
    merge, zero-depth runs and both -K modes."""
    if not _native_available():
        pytest.skip("native cnv kernels unavailable")
    rng = np.random.default_rng(7)
    L = 120_000
    chrom = rng.choice(np.frombuffer(b"ACGT", np.uint8), L).astype(np.uint8)
    chrom[5000:5300] = ord("N")
    rd_hi = rng.poisson(20, L).astype(np.int32)
    rd_hi[30000:34000] //= 3                     # deletion-like dip
    rd_hi[70000:76000] *= 2                      # duplication-like bump
    rd_lo = rng.poisson(1, L).astype(np.int32)
    rd_mq = (rd_hi.astype(np.int64) + rd_lo) * 55
    cfg = GromConfig(bam="x", ref_fasta="y", out_vcf="z", ranks_stdev=ranks)
    drv = DerivedConfig.from_insert_stats(cfg, 300, 200, 400, 100,
                                          int(rd_hi.sum()))

    class A:
        pass

    arr = A()
    arr.rd_hi, arr.rd_lo, arr.rd_mq = rd_hi, rd_lo, rd_mq
    chrom_b = np.frombuffer(bytes(chrom), np.uint8)
    dn, pn = _calls(chrom_b, arr, cfg, drv, native=True)
    do, po = _calls(chrom_b, arr, cfg, drv, native=False)
    assert [(c.start, c.end, c.stdev) for c in dn] == \
        [(c.start, c.end, c.stdev) for c in do]
    assert [(c.start, c.end, c.stdev) for c in pn] == \
        [(c.start, c.end, c.stdev) for c in po]
    assert dn or pn                               # scenario actually fires
