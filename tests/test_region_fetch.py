"""BAI-planned regional BAM fetch must decode exactly the records a
full-file read yields for that reference (htslib bam_fetch equivalent;
reference src/GROM.c:981-992)."""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

FIELDS = ("refid", "pos", "mapq", "flag", "mrefid", "mpos", "tlen", "lseq",
          "cigar", "cigar_off", "seq", "qual", "seq_off")


@pytest.mark.parametrize("name,nref", [("ctx2x60k", 2), ("ds200k", 1)])
def test_region_fetch_matches_full(name, nref):
    path = os.path.join(DATA, name, "ds.bam")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    from grom_tpu.driver import _subset_reads
    from grom_tpu.ingest import bam as bam_mod

    h, full = bam_mod.read_bam(path)
    for refid in range(nref):
        h2, reg = bam_mod.read_bam_region(path, refid)
        assert h2.ref_names == h.ref_names
        want = _subset_reads(full, np.flatnonzero(full.refid == refid))
        assert len(reg) == len(want)
        for f in FIELDS:
            assert np.array_equal(getattr(reg, f), getattr(want, f)), f
        assert reg.names == want.names
        assert reg.sa_tags == want.sa_tags


def test_read_bam_header(tmp_path):
    path = os.path.join(DATA, "ds200k", "ds.bam")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    from grom_tpu.ingest import bam as bam_mod
    h_full, _ = bam_mod.read_bam(path)
    h = bam_mod.read_bam_header(path)
    assert h.ref_names == h_full.ref_names
    assert h.ref_lengths == h_full.ref_lengths
