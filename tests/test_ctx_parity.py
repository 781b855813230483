"""Translocation (CTX/BND) parity on the two-contig fixture: both the main
VCF and the .ctx.vcf must match the oracle byte-for-byte (modulo header
date/reference lines)."""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data", "ctx2x60k")


def _body(path):
    with open(path) as f:
        return [l.rstrip("\n") for l in f
                if not l.startswith("##fileDate") and not l.startswith("##reference")]


def test_ctx_bnd_parity(tmp_path):
    if not os.path.exists(os.path.join(DATA, "oracle.ctx.vcf")):
        pytest.skip("fixture missing")
    out = str(tmp_path / "out.vcf")
    cfg = GromConfig(bam=os.path.join(DATA, "ds.bam"),
                     ref_fasta=os.path.join(DATA, "ds.fa"), out_vcf=out)
    res = run(cfg)
    assert _body(res.ctx_path) == _body(os.path.join(DATA, "oracle.ctx.vcf"))
    got = [l for l in open(out) if not l.startswith("#")]
    want = [l for l in open(os.path.join(DATA, "oracle.vcf")) if not l.startswith("#")]
    assert got == want
