"""Tabular (-f) output parity: byte-identical to the reference's non-VCF
format (main file and .ctx file), including the insert-stats prelude, the
92-column header, per-type row layouts, and the CNV section headers."""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.parametrize("name", ["ds200k", "ctx2x60k", "sv400k"])
def test_tabular_parity(name, tmp_path):
    d = os.path.join(DATA, name)
    oracle = os.path.join(d, "oracle.tab.txt")
    if not os.path.exists(oracle):
        pytest.skip("fixture missing")
    out = str(tmp_path / "out.txt")
    cfg = GromConfig(bam=os.path.join(d, "ds.bam"),
                     ref_fasta=os.path.join(d, "ds.fa"),
                     out_vcf=out, vcf_output=False)
    res = run(cfg)
    assert res.ctx_path == out + ".ctx"
    assert open(out).read() == open(oracle).read()
    assert open(out + ".ctx").read() == open(oracle + ".ctx").read()
