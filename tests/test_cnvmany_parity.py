"""CNV parity at golden-file scale (VERDICT-r3 item 6): the cnvmany dataset
(grom_tpu/testing/cnvmany.py — regenerated deterministically, only the
reference-binary oracles are committed) emits 31 CNV rows in default mode
and 29 under -K 0, approximating the tilapia golden file's 127-DEL scale.
Every row must match the oracle within the SD/Z float tolerance."""

import os

import pytest

from grom_tpu.config import GromConfig
from grom_tpu.driver import run
from tests.test_full_parity import _rows, _rows_equal

DATA = os.path.join(os.path.dirname(__file__), "data", "cnvmany")



@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from grom_tpu.testing import cnvmany
    d = tmp_path_factory.mktemp("cnvmany")
    return cnvmany.build(str(d / "ds"))


@pytest.mark.parametrize("tag,kw", [
    ("", {}),
    (".k0", {"ranks_stdev": 0}),
])
def test_cnvmany_parity(tmp_path, dataset, tag, kw):
    fa, bam = dataset
    out = str(tmp_path / "out.vcf")
    cfg = GromConfig(bam=bam, ref_fasta=fa, out_vcf=out,
                     rd_pval_threshold=1e-4, **kw)
    run(cfg, file_date="2026725", engine="host")
    got = _rows(out)
    want = _rows(os.path.join(DATA, "oracle%s.vcf" % tag))
    assert len(got) == len(want), (len(got), len(want))
    for a, b in zip(got, want):
        assert _rows_equal(a, b), (a, b)
    n_cnv = sum(1 for r in got if ("<DEL>" in r or "<DUP>" in r)
                and "SD:Z:CN" in r)
    assert n_cnv >= 29, n_cnv     # dozens of CNV rows really under test
