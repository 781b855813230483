"""Record-level SNV parity against the reference binary's output on the
committed fixtures."""

import os

import numpy as np
import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data")


def _snv_rows(path):
    """SNV rows keyed by (chrom, pos) → full line (SNV rows are single-base
    REF/ALT with the GT:PR:AF... FORMAT)."""
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            t = line.rstrip("\n").split("\t")
            if len(t) >= 10 and t[8].startswith("GT:PR:AF") and len(t[3]) == 1 \
                    and len(t[4]) == 1 and t[4] in "ACGT":
                out[(t[0], int(t[1]))] = line.rstrip("\n")
    return out


@pytest.mark.parametrize("fixture,flags", [("ds200k", {}),
                                           ("dup60k", {"rmdup": True})])
def test_snv_rows_match_oracle(tmp_path, fixture, flags):
    d = os.path.join(DATA, fixture)
    if not os.path.exists(os.path.join(d, "oracle.vcf")):
        pytest.skip("fixture missing")
    out = str(tmp_path / "out.vcf")
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"),
                     out_vcf=out, **flags)
    run(cfg)

    want = _snv_rows(os.path.join(d, "oracle.vcf"))
    got = _snv_rows(out)

    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    diff = {k: (got[k], want[k]) for k in set(want) & set(got) if got[k] != want[k]}
    msg = (f"missing={len(missing)} {missing[:5]}\n"
           f"extra={len(extra)} {extra[:5]}\n"
           f"field-diffs={len(diff)} {list(diff.items())[:3]}")
    assert not missing and not extra and not diff, msg
