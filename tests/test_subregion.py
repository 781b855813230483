"""-c sub-region child mode: headerless partial outputs must match the
reference's child run byte for byte (src/GROM.c:20676-20692, :5730)."""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data", "ds200k")


def test_child_region_parity(tmp_path):
    oracle = os.path.join(DATA, "oracle.region-0-0-110000")
    if not os.path.exists(oracle):
        pytest.skip("fixture missing")
    out = str(tmp_path / "o.vcf")
    cfg = GromConfig(bam=os.path.join(DATA, "ds.bam"),
                     ref_fasta=os.path.join(DATA, "ds.fa"),
                     out_vcf=out, one_chromosome="0,0,0,110000")
    res = run(cfg)
    assert res.vcf_path == out + ".chrSim-0"
    assert open(res.vcf_path).read() == open(oracle).read()
    assert open(res.ctx_path).read() == open(oracle + ".ctx").read()


def test_split_regions():
    from grom_tpu.cli import split_regions
    cfg = GromConfig(bam="x", ref_fasta="x", out_vcf="x", sub_region_mb=1)
    regs = split_regions(3_600_000, cfg)
    # mirrors the reference loop: 1Mb regions (+10kb overlap), last region
    # absorbs the <=1.25Mb remainder
    assert regs == [(0, 0, 1_010_000), (1, 1_000_000, 2_010_000),
                    (2, 2_000_000, 3_010_000), (3, 3_000_000, 3_600_000)]
    assert split_regions(800_000, cfg) == [(0, 0, 800_000)]
    cfg0 = GromConfig(bam="x", ref_fasta="x", out_vcf="x", sub_region_mb=0)
    assert split_regions(5, cfg0) == [(0, 0, 5)]
