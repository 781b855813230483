"""Whole-file parity (all record classes except CNV) against the oracle.

CNV rows (<DEL>/<DUP> with SD:Z:CN:CS) are excluded until the CNV engine
lands; everything else must match the oracle line-for-line in order.
"""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data")


def _rows(path, include_cnv=False):
    out = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            t = line.rstrip("\n").split("\t")
            if len(t) > 8 and t[8].startswith("SD:Z:CN") and not include_cnv:
                continue
            out.append(line.rstrip("\n"))
    return out


@pytest.mark.parametrize("fixture,flags", [("ds200k", {}),
                                           ("dup60k", {"rmdup": True})])
def test_full_vcf_parity(tmp_path, fixture, flags):
    d = os.path.join(DATA, fixture)
    if not os.path.exists(os.path.join(d, "oracle.vcf")):
        pytest.skip("fixture missing")
    out = str(tmp_path / "out.vcf")
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"),
                     out_vcf=out, **flags)
    run(cfg)

    want = _rows(os.path.join(d, "oracle.vcf"))
    got = _rows(out)
    onlyw = [r for r in want if r not in set(got)]
    onlyg = [r for r in got if r not in set(want)]
    assert want == got, (
        f"want {len(want)} rows got {len(got)};\n"
        f"missing({len(onlyw)}): {onlyw[:4]}\nextra({len(onlyg)}): {onlyg[:4]}")


@pytest.mark.parametrize("fixture", ["ds200k"])
def test_ctx_vcf_header_parity(tmp_path, fixture):
    d = os.path.join(DATA, fixture)
    if not os.path.exists(os.path.join(d, "oracle.ctx.vcf")):
        pytest.skip("fixture missing")
    out = str(tmp_path / "out.vcf")
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"), out_vcf=out)
    res = run(cfg)
    with open(os.path.join(d, "oracle.ctx.vcf")) as f:
        want = [l for l in f.read().splitlines() if not l.startswith("##fileDate")
                and not l.startswith("##reference")]
    with open(res.ctx_path) as f:
        got = [l for l in f.read().splitlines() if not l.startswith("##fileDate")
               and not l.startswith("##reference")]
    assert got == want
