"""INDEL_INS / INDEL_DEL row parity against the reference oracle."""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data")


def _indel_rows(path):
    ins, del_ = {}, {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            t = line.rstrip("\n").split("\t")
            if len(t) < 10:
                continue
            if t[8].startswith("SPR:SEV:SRD"):  # INDEL_INS
                ins[(t[0], int(t[1]))] = line.rstrip("\n")
            elif t[8].startswith("SPR:EPR:SEV:EEV") and (t[4] == "." or t[4] == "<DEL>") \
                    and len(t[8].split(":")) == 13:
                del_[(t[0], int(t[1]))] = line.rstrip("\n")
    return ins, del_


@pytest.mark.parametrize("fixture,flags", [("ds200k", {}),
                                           ("dup60k", {"rmdup": True})])
def test_indel_rows_match_oracle(tmp_path, fixture, flags):
    d = os.path.join(DATA, fixture)
    if not os.path.exists(os.path.join(d, "oracle.vcf")):
        pytest.skip("fixture missing")
    out = str(tmp_path / "out.vcf")
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"),
                     out_vcf=out, **flags)
    run(cfg)

    for cls in (0, 1):
        want = _indel_rows(os.path.join(d, "oracle.vcf"))[cls]
        got = _indel_rows(out)[cls]
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        diff = {k: (got[k], want[k]) for k in set(want) & set(got) if got[k] != want[k]}
        name = ["INDEL_INS", "INDEL_DEL"][cls]
        msg = (f"{name}: missing={len(missing)} {missing[:4]}\n"
               f"extra={len(extra)} {extra[:4]}\n"
               f"diffs={len(diff)} {list(diff.items())[:2]}")
        assert not missing and not extra and not diff, msg
