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
    # drop caches the oracle writes next to inputs (not fixture content)
    for suffix in (".bam.mean", ".fa.info"):
        p = prefix + suffix
        if os.path.exists(p):
            os.remove(p)
    meta = {"length": length, "seed": seed, "sim": sim.__dict__,
            "oracle_flags": oracle_flags or [], "variant_kw": variant_kw}
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    # primary parity fixture: everything in one dataset
    make("ds200k", length=200_000, seed=7, sim=SimConfig(coverage=28.0, seed=8),
         n_sv_del=1, n_sv_dup=1, n_sv_inv=1, n_sv_ins=1)
    # duplicate-read fixture for -M parity
    make("dup60k", length=60_000, seed=11,
         sim=SimConfig(coverage=25.0, dup_rate=0.15, seed=12),
         oracle_flags=["-M"], n_sv_del=0, n_sv_dup=0, n_sv_inv=0, n_sv_ins=0)
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
