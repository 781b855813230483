#!/usr/bin/env python
"""Generate the committed test fixtures: synthetic datasets + reference-GROM
oracle outputs. Run from the repo root; requires the reference binary
(/root/reference/dist/GROM) to produce the oracle VCFs.

Fixtures are deterministic (fixed seeds) so regeneration is reproducible.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grom_tpu.testing.oracle import oracle_table_paths, run_oracle
from grom_tpu.testing.simulate import SimConfig, quick_dataset

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "data")


def make(name: str, length: int, seed: int, sim: SimConfig, oracle_flags=None,
         **variant_kw):
    d = os.path.join(FIXDIR, name)
    if os.path.exists(os.path.join(d, "oracle.vcf")):
        print(name, "exists; skipping")
        return
    os.makedirs(d, exist_ok=True)
    prefix = os.path.join(d, "ds")
    fa, bam, variants = quick_dataset(prefix, length=length, seed=seed, sim=sim,
                                      **variant_kw)
    with open(os.path.join(d, "truth.json"), "w") as f:
        json.dump([v.to_dict() for v in variants], f, indent=1)
    out = os.path.join(d, "oracle.vcf")
    r = run_oracle(bam, fa, out, extra_flags=oracle_flags)
    print(name, "oracle rc:", r.returncode)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-500:])
        sys.exit(1)
    # tabular-mode oracle (-f) for the same dataset
    rt = run_oracle(bam, fa, os.path.join(d, "oracle.tab.txt"),
                    extra_flags=(oracle_flags or []) + ["-f"])
    print(name, "oracle tab rc:", rt.returncode)
    # drop caches the oracle writes next to inputs (not fixture content)
    for suffix in (".bam.mean", ".fa.info"):
        p = prefix + suffix
        if os.path.exists(p):
            os.remove(p)
    meta = {"length": length, "seed": seed, "sim": sim.__dict__,
            "oracle_flags": oracle_flags or [], "variant_kw": variant_kw}
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def make_ctx_fixture():
    """Two-contig dataset with a reciprocal translocation junction
    (c1:20000 | c2:30000): wide insert distribution so the reciprocal
    mate-match window (insert_max - 2*read_len) can close."""
    import numpy as np

    from grom_tpu.ingest.bam import CMATCH, BamHeader, BamWriter, encode_record

    d = os.path.join(FIXDIR, "ctx2x60k")
    if os.path.exists(os.path.join(d, "oracle.vcf")):
        print("ctx2x60k exists; skipping")
        return
    os.makedirs(d, exist_ok=True)
    L1 = L2 = 60000
    rng = np.random.default_rng(11)
    ref1 = rng.choice(list(b"ACGT"), L1).astype(np.uint8)
    ref2 = rng.choice(list(b"ACGT"), L2).astype(np.uint8)
    fa = os.path.join(d, "ds.fa")
    with open(fa, "w") as f:
        for name, ref in (("c1", ref1), ("c2", ref2)):
            f.write(f">{name}\n")
            s = ref.tobytes().decode()
            for i in range(0, len(s), 60):
                f.write(s[i:i + 60] + "\n")
    header = BamHeader(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:%d\n@SQ\tSN:c2\tLN:%d\n"
        % (L1, L2), ["c1", "c2"], [L1, L2])
    refs = [ref1, ref2]
    recs = []
    ni = [0]

    def pair_same(rid, p1, ins):
        p2 = p1 + ins - 100
        nm = f"r{ni[0]:05d}".encode()
        ni[0] += 1
        q = bytes([35] * 100)
        recs.append((rid, p1, encode_record(nm, 0x63, rid, p1, 60,
                    [(CMATCH, 100)], rid, p2, ins, refs[rid][p1:p1 + 100].tobytes(), q)))
        recs.append((rid, p2, encode_record(nm, 0x93, rid, p2, 60,
                    [(CMATCH, 100)], rid, p1, -ins, refs[rid][p2:p2 + 100].tobytes(), q)))

    def pair_ctx(rid1, p1, fwd1, rid2, p2, fwd2):
        nm = f"t{ni[0]:05d}".encode()
        ni[0] += 1
        q = bytes([35] * 100)
        f1 = 0x1 | 0x40 | (0 if fwd1 else 0x10) | (0 if fwd2 else 0x20)
        f2 = 0x1 | 0x80 | (0 if fwd2 else 0x10) | (0 if fwd1 else 0x20)
        recs.append((rid1, p1, encode_record(nm, f1, rid1, p1, 60,
                    [(CMATCH, 100)], rid2, p2, 0, refs[rid1][p1:p1 + 100].tobytes(), q)))
        recs.append((rid2, p2, encode_record(nm, f2, rid2, p2, 60,
                    [(CMATCH, 100)], rid1, p1, 0, refs[rid2][p2:p2 + 100].tobytes(), q)))

    for rid in (0, 1):
        p = 1000
        while p < 58000:
            pair_same(rid, p, int(rng.integers(250, 451)))
            p += 12
    for k in range(18):
        pair_ctx(0, 19900 - k * 8, True, 1, 30000 + int(rng.integers(0, 60)), False)
    recs.sort(key=lambda t: (t[0], t[1]))
    bam = os.path.join(d, "ds.bam")
    w = BamWriter(bam, header)
    for rid, pos, r in recs:
        w.write_record(rid, pos, pos + 100, r)
    w.close()
    r = run_oracle(bam, fa, os.path.join(d, "oracle.vcf"))
    print("ctx2x60k oracle rc:", r.returncode)
    rt = run_oracle(bam, fa, os.path.join(d, "oracle.tab.txt"),
                    extra_flags=["-f"])
    print("ctx2x60k oracle tab rc:", rt.returncode)
    for suffix in (".bam.mean", ".fa.info"):
        p = os.path.join(d, "ds" + suffix)
        if os.path.exists(p):
            os.remove(p)


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    make_ctx_fixture()
    # primary parity fixture: everything in one dataset
    make("ds200k", length=200_000, seed=7, sim=SimConfig(coverage=28.0, seed=8),
         n_sv_del=1, n_sv_dup=1, n_sv_inv=1, n_sv_ins=1)
    # duplicate-read fixture for -M parity
    make("dup60k", length=60_000, seed=11,
         sim=SimConfig(coverage=25.0, dup_rate=0.15, seed=12),
         oracle_flags=["-M"], n_sv_del=0, n_sv_dup=0, n_sv_inv=0, n_sv_ins=0)
    # fixture that fires the rarer emitters: clustered SV <DUP> rows (needs a
    # wide insert distribution — the reference's DUP start/end pairing window
    # is offset by 2*lseq, so 0.75*(insert_max-insert_min) must exceed
    # 2*read_len, src/GROM.c:12207-12470) and read-depth CNV <DEL>/<DUP>
    # SD:Z:CN:CS rows (src/GROM.c:17280-17493)
    make("sv400k", length=400_000, seed=13,
         sim=SimConfig(coverage=30.0, seed=113, insert_sd=60),
         n_sv_del=3, n_sv_dup=3, n_sv_inv=1, n_sv_ins=1,
         sv_len=(800, 4000), hom_frac=0.4)
    # snapshot the oracle's binomial table caches for table-parity tests
    hez, mq = oracle_table_paths()
    tabdir = os.path.join(FIXDIR, "tables")
    os.makedirs(tabdir, exist_ok=True)
    for p in (hez, mq):
        if os.path.exists(p):
            shutil.copy(p, tabdir)
    print("done")


if __name__ == "__main__":
    main()
