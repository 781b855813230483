#!/usr/bin/env python
"""Refresh the cnvmany oracles: regenerate the deterministic CNV-dense
dataset (grom_tpu/testing/cnvmany.py) and run the reference binary over it
with both -K modes. Only the oracle VCFs are committed — the 55MB BAM is
rebuilt on demand by the tests.

Run from the repo root (needs /root/reference/dist/GROM via testing.oracle).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grom_tpu.testing import cnvmany
from grom_tpu.testing.oracle import run_oracle

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "data", "cnvmany")


def main(out_dir=FIXDIR):
    os.makedirs(out_dir, exist_ok=True)
    import tempfile
    with tempfile.TemporaryDirectory(prefix="cnvmany_") as tmp:
        fa, bam = cnvmany.build(os.path.join(tmp, "ds"))
        for tag, extra in (("", []), (".k0", ["-K", "0"])):
            out = os.path.join(out_dir, "oracle%s.vcf" % tag)
            r = run_oracle(bam, fa, out,
                           extra_flags=cnvmany.ORACLE_FLAGS + extra)
            print("oracle%s rc=%d" % (tag, r.returncode))
            if r.returncode != 0:
                print(r.stdout[-1500:], r.stderr[-500:])
                sys.exit(1)
            n_del = n_dup = 0
            with open(out) as f:
                for ln in f:
                    cols = ln.split("\t")
                    if len(cols) > 8 and "SD:Z:CN" in cols[8]:
                        n_del += "<DEL>" in ln
                        n_dup += "<DUP>" in ln
            print("  CNV rows: %d DEL + %d DUP" % (n_del, n_dup))
    meta = {"length": cnvmany.LENGTH, "seed": cnvmany.SEED,
            "coverage": cnvmany.COVERAGE,
            "oracle_flags": cnvmany.ORACLE_FLAGS,
            "note": "dataset regenerated deterministically by "
                    "grom_tpu/testing/cnvmany.py:build"}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or [FIXDIR]))
