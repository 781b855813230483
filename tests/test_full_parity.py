"""Whole-file parity (every record class) against the oracle.

All rows must match line-for-line in order; for CNV rows (SD:Z:CN:CS) the SD
and Z sample fields are compared with 1e-4 relative tolerance — the
reference's rank-z path depends on last-ulp behavior of its 2010-era glibc
pow() inside the pval2sd bisection, which shifts a handful of 0.01-quantized
z-scores (everything else in the CNV row is exact).
"""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run

DATA = os.path.join(os.path.dirname(__file__), "data")


def _rows(path, include_cnv=True):
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


def _rows_equal(a, b):
    if a == b:
        return True
    ta, tb = a.split("\t"), b.split("\t")
    if len(ta) != len(tb) or ta[:9] != tb[:9]:
        return False
    if not ta[8].startswith("SD:Z:CN"):
        return False
    fa, fb = ta[9].split(":"), tb[9].split(":")
    if len(fa) != 4 or len(fb) != 4:
        return False
    for i in (0, 1):  # SD, Z with tolerance
        va, vb = float(fa[i]), float(fb[i])
        if abs(va - vb) > 1e-4 * max(abs(vb), 1e-300):
            return False
    return fa[2] == fb[2] and fa[3] == fb[3]


@pytest.mark.parametrize("fixture,flags", [("ds200k", {}),
                                           ("dup60k", {"rmdup": True}),
                                           ("sv400k", {})])
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
    assert len(want) == len(got), (
        f"want {len(want)} rows got {len(got)};\n"
        f"missing: {[r for r in want if r not in set(got)][:4]}\n"
        f"extra: {[r for r in got if r not in set(want)][:4]}")
    for i, (w, g) in enumerate(zip(want, got)):
        assert _rows_equal(g, w), f"row {i}:\n got: {g}\nwant: {w}"


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
