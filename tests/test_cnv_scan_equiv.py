"""Differential test: the vectorized CNV window scan must reproduce the
direct reference-port loop (src/GROM.c:19358-20035) exactly — same calls,
same boundaries, same stdev to the last ulp — across randomized inputs."""

import numpy as np
import pytest

from grom_tpu.call.cnv import _window_scan
from grom_tpu.testing.cnv_oracle import window_scan_native, window_scan_ref
from grom_tpu.config import GromConfig


def _random_case(rng, L=4000):
    mean = rng.uniform(5, 40)
    dep = rng.poisson(mean, L).astype(np.int64)
    for _ in range(int(rng.integers(1, 5))):
        a = int(rng.integers(0, L - 600))
        w = int(rng.integers(120, 600))
        if rng.random() < 0.5:
            dep[a:a + w] //= rng.integers(2, 10)
        else:
            dep[a:a + w] *= rng.integers(2, 4)
    mq = rng.uniform(10, 60, L)
    mq[dep == 0] = 0.0
    gc = rng.integers(0, 101, L)
    nwin = rng.integers(0, 300, (2, 101))
    low = (rng.random(L) < 0.08).astype(np.int64)
    sd = rng.normal(0, 2.0, L)
    return dep, mq, gc, nwin, low, sd, float(dep.mean())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_window_scan_matches_reference_port(seed):
    cfg = GromConfig(bam="x", ref_fasta="x", out_vcf="x")
    rng = np.random.default_rng(seed)
    minw, maxw = cfg.min_rd_window_len, cfg.max_rd_window_len
    for trial in range(10):
        dep, mq, gc, nwin, low, sd, ave = _random_case(rng)
        L = len(dep)
        thr_del = np.stack([np.full(101, 0.7 * ave),
                            np.full(101, 0.7 * ave * rng.uniform(0.5, 1.5))])
        thr_dup = np.stack([np.full(101, 1.3 * ave),
                            np.full(101, 1.3 * ave * rng.uniform(0.5, 1.5))])
        ws = np.zeros(maxw + 1)
        ws[minw:] = rng.uniform(0.5, 2.0)
        blocks = [(50, L - 250)]
        for side, thr in ((1, thr_del), (-1, thr_dup)):
            ref = window_scan_ref(blocks, dep, mq, gc, nwin, low, sd, thr,
                                   ws, cfg, L, side)
            new = _window_scan(blocks, dep, mq, gc, nwin, low, sd, thr,
                               ws, cfg, L, side)
            assert ([(c.start, c.end, c.stdev) for c in ref]
                    == [(c.start, c.end, c.stdev) for c in new]), \
                (seed, trial, side)
            nat = window_scan_native(blocks, dep, mq, gc, nwin, low, sd, thr,
                                     ws, cfg, L, side)
            if nat is not None:
                assert ([(c.start, c.end, c.stdev) for c in nat]
                        == [(c.start, c.end, c.stdev) for c in ref]), \
                    (seed, trial, side)


def test_broken_sort_native_matches_python():
    """gn_broken_sort must produce the exact permutation of the Python
    msort emulation of the reference's int-comparator qsort
    (src/GROM.c:20164 + :1105), including wraparound-comparator cases."""
    from grom_tpu.call.cnv import _broken_double_sort
    from grom_tpu.native import get_lib
    if get_lib() is None or not hasattr(get_lib(), "gn_broken_sort"):
        import pytest
        pytest.skip("native library unavailable")

    import unittest.mock as mock
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 3, 17, 100, 1001):
        vals = rng.uniform(0.0, 4.0, n)
        nat = _broken_double_sort(vals.copy())
        with mock.patch("grom_tpu.native.get_lib", return_value=None):
            ref = _broken_double_sort(vals.copy())
        assert np.array_equal(nat.view(np.uint8), ref.view(np.uint8)), n


def test_repeat_rle_chunked_matches_whole_array(monkeypatch):
    """preprocess_reference's chunked repeat-run RLE (run-carry across
    chunk edges, boundary-closed runs) is identical to the whole-array
    formulation it replaced (behavioral spec: src/GROM.c:1727-1764)."""
    from grom_tpu.call import cnv as C

    def oracle(chrom, m, min_repeat):
        L = len(chrom)
        W = 2 * m - 1
        lo, hi = m - 1, L - W
        up = np.where(chrom >= 97, chrom - 32, chrom).astype(np.uint8)
        lut = np.full((256, 256), 10, np.int8)
        for t, pair in enumerate(C._REPEAT_PAIRS):
            a, b = pair[0], pair[1]
            lut[a, b] = t
            lut[b, a] = t
        pc = lut[up[lo:hi], up[lo + 1:hi + 1]]
        n = hi - lo
        change = np.flatnonzero(pc[1:] != pc[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        types = pc[starts]
        valid = (types < 10) & (ends < n) & \
            (ends - starts - 1 >= min_repeat - 1)
        return (lo + starts[valid], lo + ends[valid],
                types[valid].astype(np.int64))

    rng = np.random.default_rng(11)
    for chunk in (997, 4096):     # tiny chunks force many boundary carries
        monkeypatch.setattr(C, "_REPEAT_RLE_CHUNK", chunk)
        for _ in range(4):
            L = int(rng.integers(8000, 40000))
            m = int(rng.integers(60, 300))
            s = rng.choice(np.frombuffer(b"ACGTacgtN", np.uint8), size=L)
            for _ in range(25):
                p = int(rng.integers(0, L - 500))
                ln = int(rng.integers(10, 400))
                pair = C._REPEAT_PAIRS[int(rng.integers(0, 10))]
                s[p:p + ln] = np.frombuffer(pair * (ln // 2 + 1),
                                            np.uint8)[:ln]
            f = C.preprocess_reference(s, m, 20)
            o_s, o_e, o_t = oracle(s, m, 20)
            assert np.array_equal(f.repeat_starts, o_s)
            assert np.array_equal(f.repeat_ends, o_e)
            assert np.array_equal(f.repeat_types, o_t)
