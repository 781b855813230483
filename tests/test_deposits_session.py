"""Chunked DepositsSession == whole-batch run_deposits: dense arrays and
every typed primary/other-slot must be bit-identical when the same reads are
fed as position-ordered chunks (both the native streaming engine and the
Python fallback)."""

import os

import numpy as np
import pytest

from grom_tpu.call import scan as scan_mod
from grom_tpu.call.deposits import DepositsSession, run_deposits
from grom_tpu.config import DerivedConfig, GromConfig
from grom_tpu.ingest import bam as bam_mod
from grom_tpu.ingest import fasta as fasta_mod
from grom_tpu.ingest.batches import build_batch
from grom_tpu.ingest.insert_size import load_or_estimate

DATA = os.path.join(os.path.dirname(__file__), "data")


def _evidence_equal(a, b):
    assert set(a.primary) == set(b.primary)
    for k, pa in a.primary.items():
        pb = b.primary[k]
        for f in ("count", "dist", "rs", "re", "mchr", "seq"):
            va, vb = getattr(pa, f), getattr(pb, f)
            if f == "seq" and va is not None and vb is not None:
                va, vb = bytes(va), bytes(vb)
            assert va == vb, (k, f, va, vb)
    assert set(a.other) == set(b.other)
    for k, sa in a.other.items():
        sb = b.other[k]
        assert len(sa) == len(sb), k
        for x, y in zip(sa, sb):
            for f in ("count", "type", "dist", "rs", "re", "mchr"):
                assert getattr(x, f) == getattr(y, f), (k, f)


@pytest.mark.parametrize("ds,native", [("ds200k", True), ("sv400k", True),
                                       ("ds200k", False)])
def test_session_matches_whole(ds, native, monkeypatch):
    if not native:
        monkeypatch.setenv("GROM_TPU_NO_NATIVE", "1")
        import grom_tpu.native as native_mod
        monkeypatch.setattr(native_mod, "_lib", None)
        monkeypatch.setattr(native_mod, "_tried", False)
    d = os.path.join(DATA, ds)
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"), out_vcf="/tmp/x.vcf")
    info = fasta_mod.index_fasta(cfg.ref_fasta)
    header, reads = bam_mod.read_bam(cfg.bam)
    ins = load_or_estimate(cfg.bam, reads, cfg)
    drv = DerivedConfig.from_insert_stats(cfg, ins.insert_mean,
                                          ins.insert_min, ins.insert_max,
                                          ins.read_len, ins.mapped_read_bases)
    from grom_tpu.driver import _subset_reads
    fa = fasta_mod.match_chromosome(header.ref_names[0], info.names)
    chrom = fasta_mod.load_chromosome(cfg.ref_fasta, info, fa)
    sub = _subset_reads(reads, np.flatnonzero(reads.refid == 0))
    batch = build_batch(sub, 0, cfg.min_mapq, cfg.add_factor, cfg.rmdup)
    ss, _, _ = scan_mod.scan_bounds(cfg, drv, sub.pos, 0)

    dense_w, ev_w = run_deposits(len(chrom), batch, fa.lower(), cfg, drv, ss)

    # feed as ~37kb position chunks (reads assigned by pos)
    sess = DepositsSession(len(chrom), fa.lower(), cfg, drv, ss)
    C = 37_000
    pos = sub.pos
    for t0 in range(0, len(chrom) + C, C):
        sel = np.flatnonzero((pos >= t0) & (pos < t0 + C))
        if not len(sel):
            continue
        csub = _subset_reads(sub, sel)
        cbatch = build_batch(csub, 0, cfg.min_mapq, cfg.add_factor, cfg.rmdup)
        assert sess.feed(cbatch)
    dense_s, ev_s = sess.finish()

    for f in dense_w.__dataclass_fields__:
        if f == "chr_len":
            continue
        assert np.array_equal(getattr(dense_w, f), getattr(dense_s, f)), f
    _evidence_equal(ev_w, ev_s)
