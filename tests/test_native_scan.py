"""Differential test: native SNV/depth accumulation (native/grom_scan.c) vs
the Python implementation in grom_tpu/call/scan.py."""

import os

import numpy as np
import pytest

from grom_tpu.call import scan as scan_mod
from grom_tpu.config import DerivedConfig, GromConfig
from grom_tpu.ingest import bam as bam_mod
from grom_tpu.ingest import fasta as fasta_mod
from grom_tpu.ingest.batches import build_batch
from grom_tpu.ingest.insert_size import load_or_estimate
from grom_tpu.native import get_lib

DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")

FIELDS = ["rd_mq", "rd_hi", "rd_lo", "snv", "snv_lowmq", "bq", "bq_all",
          "mq", "mq_all", "bq_read_count", "mq_read_count", "read_count_all",
          "pos_in_read", "fstrand"]


@pytest.mark.parametrize("ds", ["ds200k", "dup60k", "ctx2x60k"])
def test_scan_differential(ds):
    d = os.path.join(DATA, ds)
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"),
                     out_vcf="/tmp/x.vcf")
    info = fasta_mod.index_fasta(cfg.ref_fasta)
    header, reads = bam_mod.read_bam(cfg.bam)
    ins = load_or_estimate(cfg.bam, reads, cfg)
    drv = DerivedConfig.from_insert_stats(cfg, ins.insert_mean,
                                          ins.insert_min, ins.insert_max,
                                          ins.read_len, ins.mapped_read_bases)
    from grom_tpu.driver import _subset_reads
    for refid, bam_name in enumerate(header.ref_names):
        fa_name = fasta_mod.match_chromosome(bam_name, info.names)
        if fa_name is None:
            continue
        sel = np.flatnonzero(reads.refid == refid)
        if not len(sel):
            continue
        chrom = fasta_mod.load_chromosome(cfg.ref_fasta, info, fa_name)
        sub = _subset_reads(reads, sel)
        batch = build_batch(sub, refid, cfg.min_mapq, cfg.add_factor,
                            cfg.rmdup)
        scan_start, _, _ = scan_mod.scan_bounds(cfg, drv, sub.pos, 0)
        eligible = batch.keep & (batch.pos >= scan_start)

        L = len(chrom)
        NT = scan_mod.NT
        mk = lambda: scan_mod.ChromArrays(
            chr_len=L,
            rd_mq=np.zeros(L, np.int32), rd_hi=np.zeros(L, np.int32),
            rd_lo=np.zeros(L, np.int32), one_base_rd=np.zeros(L, np.int32),
            indel_sc_rd=np.zeros(L, np.int32), sc_rd=np.zeros(L, np.int32),
            snv=np.zeros((NT, L), np.int32),
            snv_lowmq=np.zeros((NT, L), np.int32),
            bq=np.zeros(L, np.int32), bq_all=np.zeros(L, np.int32),
            mq=np.zeros(L, np.int32), mq_all=np.zeros(L, np.int32),
            bq_read_count=np.zeros(L, np.int32),
            mq_read_count=np.zeros(L, np.int32),
            read_count_all=np.zeros(L, np.int32),
            pos_in_read=np.zeros((NT, L), np.int32),
            fstrand=np.zeros((NT, L), np.int32))

        a_nat = mk()
        assert scan_mod._accumulate_native(a_nat, chrom, batch, eligible, cfg)
        a_py = mk()
        scan_mod._accumulate_rd_lists(a_py, batch, eligible, cfg)
        scan_mod._accumulate_snv(a_py, chrom, batch, eligible, cfg)

        for f in FIELDS:
            x, y = getattr(a_py, f), getattr(a_nat, f)
            assert np.array_equal(x, y), (ds, bam_name, f,
                                          np.argwhere(x != y)[:5])
