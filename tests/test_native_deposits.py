"""Differential tests: native C deposit engine vs the Python reference
implementation (grom_tpu/call/deposits.py).

The Python engine is the parity-bearing implementation (golden-tested against
the reference binary); the native engine must replay it bit-identically —
every dense array, every typed primary, every other-slot in order.
"""

import os

import numpy as np
import pytest

from grom_tpu.call import scan as scan_mod
from grom_tpu.call.deposits import run_deposits_native, run_deposits_py
from grom_tpu.config import DerivedConfig, GromConfig
from grom_tpu.ingest import bam as bam_mod
from grom_tpu.ingest import fasta as fasta_mod
from grom_tpu.ingest.bam import RawReads
from grom_tpu.ingest.batches import build_batch
from grom_tpu.ingest.insert_size import load_or_estimate
from grom_tpu.native import get_lib

DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def _assert_equal_state(dp, sp, dn, sn):
    for f in dp.__dataclass_fields__:
        if f == "chr_len":
            continue
        a, b = getattr(dp, f), getattr(dn, f)
        assert np.array_equal(a, b), (f, np.flatnonzero(a != b)[:5])
    assert set(sp.primary) == set(sn.primary)
    for k in sp.primary:
        a, b = sp.primary[k], sn.primary[k]
        assert (a.count, a.dist, a.rs, a.re, a.mchr, a.seq) == \
            (b.count, b.dist, b.rs, b.re, b.mchr, b.seq), k
    pk = {p for p in sp.other if sp.other[p]}
    nk = {p for p in sn.other if sn.other[p]}
    assert pk == nk
    for p in pk:
        A, B = sp.other[p], sn.other[p]
        assert len(A) == len(B), p
        for x, y in zip(A, B):
            assert (x.count, x.type, x.dist, x.rs, x.re, x.mchr) == \
                (y.count, y.type, y.dist, y.rs, y.re, y.mchr), p


@pytest.mark.parametrize("ds", ["ds200k", "dup60k", "ctx2x60k"])
def test_fixture_differential(ds):
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
        res = run_deposits_native(len(chrom), batch, fa_name.lower(), cfg,
                                  drv, scan_start)
        assert res is not None
        dn, sn = res
        dp, sp = run_deposits_py(len(chrom), batch, fa_name.lower(), cfg,
                                 drv, scan_start)
        _assert_equal_state(dp, sp, dn, sn)


def _mkreads(rows):
    """rows: (pos, flag, mapq, mrefid, mpos, tlen, cigar_ops, seq, sa_tag)
    where cigar_ops is [(len, op_char)]."""
    OPS = "MIDNSHP=X"
    R = len(rows)
    cig_all, cig_off = [], [0]
    seq_all, seq_off = [], [0]
    for r in rows:
        for ln, ch in r[6]:
            cig_all.append((ln << 4) | OPS.index(ch))
        cig_off.append(len(cig_all))
        seq_all.extend(r[7])
        seq_off.append(len(seq_all))
    return RawReads(
        refid=np.zeros(R, np.int32),
        pos=np.array([r[0] for r in rows], np.int64),
        mapq=np.array([r[2] for r in rows], np.int32),
        flag=np.array([r[1] for r in rows], np.int32),
        mrefid=np.array([r[3] for r in rows], np.int32),
        mpos=np.array([r[4] for r in rows], np.int64),
        tlen=np.array([r[5] for r in rows], np.int64),
        lseq=np.array([len(r[7]) for r in rows], np.int64),
        cigar=np.array(cig_all, np.uint32),
        cigar_off=np.array(cig_off, np.int64),
        seq=np.frombuffer("".join(
            "".join(chr(c) for c in r[7]) for r in rows).encode(), np.uint8).copy(),
        qual=np.full(sum(len(r[7]) for r in rows), 30, np.uint8),
        seq_off=np.array(seq_off, np.int64),
        names=[b"r%d" % i for i in range(R)],
        sa_tags=[r[8] for r in rows],
    )


def test_adversarial_slots():
    """Force the other-slot machinery: competing dists at one position,
    dominant swap, 50-slot overflow, CTX sign keys, zero-weight deposits."""
    cfg = GromConfig(bam="x", ref_fasta="x", out_vcf="x")
    drv = DerivedConfig.from_insert_stats(cfg, insert_mean=300,
                                          insert_min=200, insert_max=400,
                                          read_len=100, mapped_reads=0)
    L = 40_000
    seq = [ord("A")] * 100
    FLAG_FR = 1 | 32          # paired, mate reverse (F read)
    FLAG_R = 1 | 16           # paired, read reverse
    base = 20_000
    rows = []
    # DEL evidence at shared positions with incompatible tlens (tol = 200):
    # tlen ladder far apart -> new other slots; repeat the largest to force
    # a dominant swap over the primary.
    for k in range(6):
        t = 900 + 500 * k
        rows.append((base, FLAG_FR, 60, 0, base + t - 100, t,
                     [(100, "M")], seq, None))
    for _ in range(8):   # make the last dist dominant -> swap
        t = 900 + 500 * 5
        rows.append((base, FLAG_FR, 60, 0, base + t - 100, t,
                     [(100, "M")], seq, None))
    # zero-weight (low mapq) deposits on a fresh position
    rows.append((base + 7, FLAG_FR, 5, 0, base + 1007 - 100, 900,
                 [(100, "M")], seq, None))
    # indel_i slot overflow: >50 distinct insertion lengths at one ref pos
    for ln in range(1, 60):
        rows.append((base + 100, 0, 60, -1, -1, 0,
                     [(50, "M"), (ln, "I"), (50 - min(ln, 49), "M")],
                     [ord("C")] * (100 + ln - min(ln, 49)), None))
    # ctx with both mate strands and different mchr
    for mrev in (0, 32):
        for mc in (1, 2):
            rows.append((base + 200, 1 | mrev, 60, mc, 5_000, 0,
                         [(100, "M")], seq, None))
    # reverse-strand ctx
    rows.append((base + 300, FLAG_R, 60, 1, 6_000, 0, [(100, "M")], seq, None))
    # split-read deletion (SA tag), same strand, unpaired
    rows.append((base + 400, 0, 60, -1, -1, 0, [(60, "M"), (40, "S")], seq,
                 b"chrT,%d,+,40S60M,60,0" % (base + 700)))
    rows.sort(key=lambda r: r[0])
    reads = _mkreads(rows)
    batch = build_batch(reads, 0, cfg.min_mapq, cfg.add_factor, False)
    scan_start = 1  # everything eligible
    res = run_deposits_native(L, batch, "chrt", cfg, drv, scan_start)
    assert res is not None
    dn, sn = res
    dp, sp = run_deposits_py(L, batch, "chrt", cfg, drv, scan_start)
    _assert_equal_state(dp, sp, dn, sn)
    # sanity: the adversarial batch really exercised the slot machinery
    assert any(len(v) for v in sp.other.values()), "no other-slots exercised"
    assert any(len(v) >= 50 for v in sp.other.values()), "no slot overflow"
