"""Windowed drain == whole-batch deposits: the chunk-drained dense channels
(concatenated) and typed-evidence arrays must be bit-identical to one
whole-chromosome run_deposits pass, for both the native windowed engine and
the Python fallback. This is the memory-bounding machinery of the streamed
driver (call/deposits.py DepositsSession.drain)."""

import os

import numpy as np
import pytest

from grom_tpu.call import scan as scan_mod
from grom_tpu.call.deposits import DepositsSession, run_deposits
from grom_tpu.call.evidence import EvidenceChunk
from grom_tpu.config import DerivedConfig, GromConfig
from grom_tpu.ingest import bam as bam_mod
from grom_tpu.ingest import fasta as fasta_mod
from grom_tpu.ingest.batches import build_batch
from grom_tpu.ingest.insert_size import load_or_estimate

DATA = os.path.join(os.path.dirname(__file__), "data")

DENSE_FIELDS = [f for f in
                ("rd", "conc", "ins", "munmapped_f", "munmapped_r",
                 "sc_left", "sc_right", "sc_left_rd", "sc_right_rd", "sc_rd",
                 "ctx_sc_left", "ctx_sc_right", "ctx_sc_left_rd",
                 "ctx_sc_right_rd", "ctx_sc_rd", "indel_sc_left",
                 "indel_sc_right", "indel_sc_left_rd", "indel_sc_right_rd",
                 "indel_sc_rd", "indel_d_f_rd", "indel_d_r_rd")]


def _ev_equal(a: EvidenceChunk, b: EvidenceChunk):
    assert np.array_equal(a.pos, b.pos)
    assert np.array_equal(a.etype, b.etype)
    assert np.array_equal(a.count, b.count)
    assert np.array_equal(a.dist, b.dist)
    assert np.array_equal(a.rs, b.rs)
    assert np.array_equal(a.re, b.re)
    assert np.array_equal(a.mchr, b.mchr)
    assert np.array_equal(a.seq_len, b.seq_len)
    for i in np.flatnonzero(a.seq_len >= 0):
        sa = a.seq_arena[a.seq_off[i]:a.seq_off[i] + a.seq_len[i]]
        sb = b.seq_arena[b.seq_off[i]:b.seq_off[i] + b.seq_len[i]]
        assert sa == sb, i
    assert np.array_equal(a.oth_pos, b.oth_pos)


@pytest.mark.parametrize("ds,native", [("ds200k", True), ("sv400k", True),
                                       ("ds200k", False)])
def test_drain_matches_whole(ds, native, monkeypatch):
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
    L = len(chrom)
    sub = _subset_reads(reads, np.flatnonzero(reads.refid == 0))
    batch = build_batch(sub, 0, cfg.min_mapq, cfg.add_factor, cfg.rmdup)
    ss, _, _ = scan_mod.scan_bounds(cfg, drv, sub.pos, 0)

    dense_w, ev_w = run_deposits(L, batch, fa.lower(), cfg, drv, ss)
    ev_w_chunk = EvidenceChunk.from_state(ev_w)

    # windowed session: feed D-chunks by read position, drain with one-chunk
    # lag (the streamed driver's cadence)
    sess = DepositsSession(L, fa.lower(), cfg, drv, ss, windowed=True)
    D = 37_000
    assert D >= sess.back
    pos = batch.pos
    bounds = list(range(0, L + D, D))
    drains = []
    prev_lo = None
    for t0 in bounds:
        i0 = int(np.searchsorted(pos, t0, side="left"))
        i1 = int(np.searchsorted(pos, t0 + D, side="left"))
        assert sess.feed(batch, i0, i1, d_chunk=D)
        if prev_lo is not None:
            res = sess.drain(min(t0, L))
            assert res is not None
            drains.append((prev_lo, min(t0, L)) + res)
        prev_lo = t0
    res = sess.drain(L, final=True)
    assert res is not None
    drains.append((min(prev_lo, L), L) + res)

    # dense: concatenated chunk bodies == whole-batch arrays
    for f in DENSE_FIELDS:
        whole = getattr(dense_w, f)
        got = np.concatenate([
            getattr(dc, f)[:hi - lo] for lo, hi, dc, _ in drains
            if hi > lo])
        assert np.array_equal(whole[:L], got[:L]), f
        # point-channel halo values must be final too
        if f not in ("rd", "conc", "ins", "munmapped_f", "munmapped_r"):
            for lo, hi, dc, _ in drains:
                h = min(hi + sess.DRAIN_HALO, L) - hi
                if h > 0:
                    assert np.array_equal(getattr(dc, f)[hi - lo:hi - lo + h],
                                          whole[hi:hi + h]), (f, lo, hi)

    # evidence: concatenated drained chunks == whole-batch evidence
    evs = [ev for _, _, _, ev in drains]
    acc = evs[0]
    for e in evs[1:]:
        acc = EvidenceChunk.concat(acc, e)
    _ev_equal(acc, ev_w_chunk)
