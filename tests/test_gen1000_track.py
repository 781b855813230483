"""-N fixed-window copy-number track parity (src/GROM.c:20244-20345):
per-chromosome <out>.1000gen.<chr> files must match the reference byte for
byte."""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data", "ds200k")


def test_gen1000_track(tmp_path):
    oracle = os.path.join(DATA, "oracle.1000gen.chrsim")
    if not os.path.exists(oracle):
        pytest.skip("fixture missing")
    out = str(tmp_path / "o.vcf")
    cfg = GromConfig(bam=os.path.join(DATA, "ds.bam"),
                     ref_fasta=os.path.join(DATA, "ds.fa"),
                     out_vcf=out, gen1000_window=1000)
    run(cfg)
    got = open(out + ".1000gen.chrsim").read()
    assert got == open(oracle).read()
