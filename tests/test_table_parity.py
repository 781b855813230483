"""Bit-level parity of our binomial tables vs the reference binary's caches.

The fixture files are the exact text the reference GROM wrote on first run
(%e-formatted doubles). We require our vectorized construction to produce
byte-identical %e text — including the reference's int64 factorial overflow,
out-of-domain erf values and row shortcuts.
"""

import gzip
import os

import numpy as np
import pytest

from grom_tpu.stats import binom

TABDIR = os.path.join(os.path.dirname(__file__), "data", "tables")


def _oracle_lines(name):
    p = os.path.join(TABDIR, name + ".gz")
    if not os.path.exists(p):
        pytest.skip("oracle table fixture missing")
    with gzip.open(p, "rt") as f:
        return f.read().splitlines()


def _format_rows(table):
    for row in table:
        yield "\t".join("%e" % v for v in row)


@pytest.mark.parametrize("name,builder", [
    ("GROM_hez_binom_table_1000.txt", lambda: binom.build_hez_table()),
    ("GROM_mq_binom_table_20_1000.txt", lambda: binom.build_mq_table(20)),
])
def test_table_text_parity(name, builder):
    want = _oracle_lines(name)
    got = list(_format_rows(builder()))
    assert len(got) == len(want)
    bad = []
    for i, (g, w) in enumerate(zip(got, want)):
        if g != w:
            gv = g.split("\t")
            wv = w.split("\t")
            cols = [j for j, (a, b) in enumerate(zip(gv, wv)) if a != b]
            bad.append((i, cols[:5], [gv[j] for j in cols[:3]], [wv[j] for j in cols[:3]]))
    assert not bad, f"{len(bad)} mismatching rows; first: {bad[:3]}"
