"""Binomial table construction: internal consistency + formula spot checks.

Byte-level parity against the reference binary's cached table text is covered
by tests/test_oracle_parity.py (which runs the real GROM binary when present).
"""

import math

import numpy as np
import pytest

from grom_tpu.stats import binom


def _exact_upper_tail(n, k, p):
    """P(X >= k) by direct summation (oracle for small n)."""
    total = 0.0
    for j in range(k, n + 1):
        total += math.comb(n, j) * p**j * (1 - p) ** (n - j)
    return total


def test_mq_table_small_n_exact():
    t = binom.build_mq_table(20)
    p = 0.01
    for n in [1, 2, 5, 10, 19]:
        for k in range(0, n + 1):
            v = t[n][k]
            if v == 0.0 and k > 0:
                continue  # row shortcut zeroed the tail
            # The reference computes 1-cdf in double, so tiny upper tails
            # suffer ~1e-16 absolute cancellation error (which we reproduce);
            # the exact-sum oracle doesn't. Allow that plus ~1e-8 rel error
            # from the incremental combinations recurrence.
            assert v == pytest.approx(_exact_upper_tail(n, k, p), rel=1e-7, abs=3e-15)


def test_mq_table_poisson_region():
    t = binom.build_mq_table(20)
    # n=100, p=0.01 → lambda=1, Poisson approximation
    lam = 1.0
    poisson_cdf3 = sum(lam**k * math.exp(-lam) / math.factorial(k) for k in range(3))
    assert t[100][3] == pytest.approx(1 - poisson_cdf3, rel=1e-12)


def test_hez_table_is_lower_cdf():
    t = binom.build_hez_table()
    # row n: value at k ≈ P(X <= k) for p=0.5
    for n in [4, 10, 15]:
        for k in range(n):
            want = sum(math.comb(n, j) * 0.5**n for j in range(k + 1))
            assert t[n][k] == pytest.approx(want, rel=1e-6)
    assert t[10][1000] == 1.0
    # monotone nondecreasing rows
    assert np.all(np.diff(t[50]) >= -1e-12)


def test_hez_row0_all_ones():
    t = binom.build_hez_table()
    assert np.all(t[0] == 1.0)


def test_mq_row_shortcut_cascades():
    t = binom.build_mq_table(20)
    # once a row value hits 0, the remainder of the row stays 0
    for n in [50, 500, 1000]:
        row = t[n]
        z = np.flatnonzero(row[1:n + 1] == 0)
        if len(z):
            first = z[0] + 1
            assert np.all(row[first:n + 1] == 0)


def test_lookup_rescale():
    t = binom.build_mq_table(20)
    # n > max_trials rescales k with integer division onto row 1000
    v = binom.lookup_cdf(t, np.array([2000]), np.array([50]))
    assert v[0] == t[1000][25]


def test_text_cache_roundtrip(tmp_path):
    t = binom.build_mq_table(20)
    path = str(tmp_path / "mq.txt")
    binom.save_table_text(t, path)
    loaded = binom.load_table_text(path)
    # %e keeps 7 significant digits; values must round-trip to that precision
    mask = np.isfinite(t)
    assert np.allclose(loaded[mask], t[mask], rtol=1e-5, atol=1e-12)
