"""Native (C) BGZF/BAM ingest must decode byte-identically to the pure
Python reference path."""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "ds200k", "ds.bam")


@pytest.fixture()
def native_lib():
    import grom_tpu.native as N
    lib = N.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_python(native_lib, monkeypatch):
    if not os.path.exists(DATA):
        pytest.skip("fixture missing")
    from grom_tpu.ingest import bam as bam_mod

    h_nat, r_nat = bam_mod.read_bam(DATA)

    import grom_tpu.native as N
    monkeypatch.setattr(N, "_lib", None)
    monkeypatch.setattr(N, "_tried", True)  # force the Python fallback
    h_py, r_py = bam_mod.read_bam(DATA)

    assert h_py.text == h_nat.text
    assert h_py.ref_names == h_nat.ref_names
    for f in ("refid", "pos", "mapq", "flag", "mrefid", "mpos", "tlen",
              "lseq", "cigar", "cigar_off", "seq", "qual", "seq_off"):
        assert np.array_equal(getattr(r_py, f), getattr(r_nat, f)), f
    assert r_py.names == r_nat.names
    assert r_py.sa_tags == r_nat.sa_tags
