"""Device pileup kernels (JAX/XLA): the per-base counting hot loop.

NOTE: these are jit-free building blocks — jit once at the pipeline level.
Nesting jit inside the composed pipeline defeated XLA's sorted-scatter fast
path on the TPU backend (measured 160ms vs 0.1ms per step).

This is the TPU fast path for the reference's per-base SNV tally
(src/GROM.c:6757-6984) and depth lists (src/GROM.c:6605-6664). The host
ingest layer (ingest/batches.py) resolves all branchy logic — CIGAR walking,
quality splits, read-name dedup masks — into flat event tensors; the device
does dense scatter-adds over an HBM-resident genome tile.

Events are padded to a fixed size per batch so every batch compiles to the
same executable. Out-of-tile or padded events carry tile_size as their
position and fall into a discard slot.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

from grom_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


class PileupEvents(NamedTuple):
    """Per-aligned-base events, tile-local coordinates, padded to [E]."""
    pos: jnp.ndarray       # int32 [E], tile-local; == tile_size for padding
    code: jnp.ndarray      # int8 [E], 0..3 nucleotide, -1 invalid
    qual: jnp.ndarray      # int32 [E]
    mapq: jnp.ndarray      # int32 [E]
    is_hi: jnp.ndarray     # bool [E]  (mapq>=min_mapq and qual>=min_bq)
    counted: jnp.ndarray   # bool [E]  (not dedup-skipped; False for padding)
    mismatch: jnp.ndarray  # bool [E]
    fwd: jnp.ndarray       # bool [E]
    pir: jnp.ndarray       # int32 [E] pos-in-read value to accumulate


class PileupTile(NamedTuple):
    snv: jnp.ndarray            # int32 [4, T]
    snv_lowmq: jnp.ndarray      # int32 [4, T]
    bq: jnp.ndarray             # int32 [T]
    bq_all: jnp.ndarray         # int32 [T]
    mq: jnp.ndarray             # int32 [T]
    mq_all: jnp.ndarray         # int32 [T]
    bq_read_count: jnp.ndarray  # int32 [T]
    mq_read_count: jnp.ndarray  # int32 [T]
    read_count_all: jnp.ndarray # int32 [T]
    pos_in_read: jnp.ndarray    # int32 [4, T]
    fstrand: jnp.ndarray        # int32 [4, T]


def pileup_tile_presorted(ev: PileupEvents, tile_size: int) -> PileupTile:
    """Fast path: events PRE-SORTED by position (host side — coordinate-sorted
    BAMs deliver events nearly sorted, so the host touch-up sort is cheap).

    TPU scatter-add with ``indices_are_sorted=True`` runs >2000x faster than
    the unsorted scatter (measured ~36G updates/s vs 15M/s on v5e), because
    XLA can lower it as a streaming segmented reduction instead of a
    serialized random-update loop.
    """
    T = tile_size
    pos = jnp.clip(ev.pos, 0, T).astype(jnp.int32)
    code = jnp.clip(ev.code, 0, 3).astype(jnp.int32)
    hi = ev.is_hi & ev.counted & (ev.code >= 0)
    lo = (~ev.is_hi) & ev.counted & (ev.code >= 0)

    def scat(mask, weights=None):
        z = jnp.zeros(T + 1, jnp.int32)
        w = jnp.where(mask, 1 if weights is None else weights, 0).astype(jnp.int32)
        return z.at[pos].add(w, indices_are_sorted=True)[:T]

    def scat4(mask, weights=None):
        # (code, pos) composite only sorted in pos — per-code masked sorted
        # scatters keep the sorted property
        w = jnp.where(mask, 1 if weights is None else weights, 0).astype(jnp.int32)
        rows = []
        for c in range(4):
            z = jnp.zeros(T + 1, jnp.int32)
            rows.append(z.at[pos].add(jnp.where(code == c, w, 0),
                                      indices_are_sorted=True)[:T])
        return jnp.stack(rows)

    snv = scat4(hi)
    snv_lowmq = scat4(lo)
    bq = scat(hi, ev.qual)
    bq_all = bq + scat(lo, ev.qual)
    mq = scat(hi, ev.mapq)
    mq_all = mq + scat(lo, ev.mapq)
    bq_rc = scat(hi)
    rc_all = bq_rc + scat(lo)
    pir = scat4(hi, ev.pir)
    fstrand = scat4(hi & ev.fwd)
    return PileupTile(snv, snv_lowmq, bq, bq_all, mq, mq_all, bq_rc, bq_rc,
                      rc_all, pir, fstrand)


def pileup_tile(ev: PileupEvents, tile_size: int) -> PileupTile:
    """Scatter-add all pileup accumulators for one tile.

    XLA lowers the .at[].add scatters onto the TPU efficiently when indices
    are int32 and the updates are batched; the +1 slot absorbs padding.
    """
    T = tile_size
    pos = jnp.clip(ev.pos, 0, T).astype(jnp.int32)

    hi = ev.is_hi & ev.counted & (ev.code >= 0)
    lo = (~ev.is_hi) & ev.counted & (ev.code >= 0)
    code = jnp.clip(ev.code, 0, 3).astype(jnp.int32)

    def scat(mask, weights=None, size=T):
        z = jnp.zeros(size + 1, jnp.int32)
        w = jnp.where(mask, 1 if weights is None else weights, 0).astype(jnp.int32)
        return z.at[pos].add(w)[:size]

    def scat4(mask, weights=None):
        z = jnp.zeros((4, T + 1), jnp.int32)
        w = jnp.where(mask, 1 if weights is None else weights, 0).astype(jnp.int32)
        return z.at[code, pos].add(w)[:, :T]

    snv = scat4(hi)
    snv_lowmq = scat4(lo)
    bq = scat(hi, ev.qual)
    bq_all = scat(hi, ev.qual) + scat(lo, ev.qual)
    mq = scat(hi, ev.mapq)
    mq_all = scat(hi, ev.mapq) + scat(lo, ev.mapq)
    bq_rc = scat(hi)
    rc_all = scat(hi) + scat(lo)
    pir = scat4(hi, ev.pir)
    fstrand = scat4(hi & ev.fwd)
    return PileupTile(snv, snv_lowmq, bq, bq_all, mq, mq_all, bq_rc, bq_rc,
                      rc_all, pir, fstrand)


def span_depth_tile(starts: jnp.ndarray, ends: jnp.ndarray,
                    weights: jnp.ndarray, tile_size: int,
                    sorted_endpoints: bool = True) -> jnp.ndarray:
    """Span add via endpoint deltas + cumsum: dst[s:e) += w for each span.

    Endpoint deltas commute, so ``starts`` and ``ends`` may each be sorted
    independently on the host (weights must be permuted consistently per
    array); with ``sorted_endpoints`` the scatters take the TPU sorted fast
    path. Tile-local coords, clipped; padding spans have s == e.
    """
    T = tile_size
    s = jnp.clip(starts, 0, T).astype(jnp.int32)
    e = jnp.clip(ends, 0, T).astype(jnp.int32)
    d = jnp.zeros(T + 1, jnp.int32)
    d = d.at[s].add(weights.astype(jnp.int32),
                    indices_are_sorted=sorted_endpoints)
    d = d.at[e].add(-weights.astype(jnp.int32),
                    indices_are_sorted=sorted_endpoints)
    return jnp.cumsum(d[:T])


def gc_weighted_tile(is_gc: jnp.ndarray, insert_mean: int,
                     tile_pad: int) -> jnp.ndarray:
    """Triangular-weighted GC% per base (src/GROM.c:1766-1861) on device via
    double prefix sums. Input must include insert_mean-1 halo on both sides;
    output is for the core region [tile_pad : len-tile_pad]."""
    m = insert_mean
    x = is_gc.astype(jnp.int32)
    c1 = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(x)])
    S = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(c1)])
    L = x.shape[0]
    p = jnp.arange(tile_pad, L - tile_pad)
    tri = (S[p + m + 1] - S[p + 1]) - (S[p + 1] - S[p - m + 1])
    return (100 * tri) // (m * m)


class SnvParams(NamedTuple):
    mq_table: jnp.ndarray   # [1001, 1001] float32
    hez_table: jnp.ndarray
    ref_code: jnp.ndarray   # int8 [T] 0..3, -1 for N
    min_snv_ratio: float
    min_snv: int
    min_ave_bq: float


def snv_detect_tile(tile: PileupTile, params: SnvParams, rd_gate: jnp.ndarray,
                    max_trials: int = 1000):
    """Vectorized per-position SNV candidate detection
    (src/GROM.c:11126-11199): returns (candidate_mask [T], best_alt [T],
    ratio, binom, hez). Depth filtering / batching stay on the host (they
    depend on cumulative flush state)."""
    counts = tile.snv                        # [4, T]
    total = counts.sum(axis=0)               # [T]
    totf = total.astype(jnp.float32)
    ratio = counts.astype(jnp.float32) / jnp.where(totf > 0, totf, jnp.inf)

    rc = tile.read_count_all.astype(jnp.float32)
    ave_bq = tile.bq_all.astype(jnp.float32) / jnp.where(rc > 0, rc, jnp.inf)

    is_alt = jnp.arange(4, dtype=jnp.int8)[:, None] != params.ref_code[None, :]
    qual = (is_alt & (ratio >= params.min_snv_ratio)
            & (counts >= params.min_snv)
            & (ave_bq >= params.min_ave_bq)[None, :]
            & rd_gate[None, :]
            & (params.ref_code >= 0)[None, :])

    r_masked = jnp.where(qual, ratio, -1.0)
    best = jnp.argmax(r_masked, axis=0)
    cand = qual.any(axis=0)

    T = counts.shape[1]
    k = counts[best, jnp.arange(T)]
    n = total
    over = n > max_trials
    safe_n = jnp.maximum(n, 1)
    k_idx = jnp.where(over, k * max_trials // safe_n, k)
    n_idx = jnp.where(over, max_trials, n)
    k_idx = jnp.clip(k_idx, 0, max_trials)
    n_idx = jnp.clip(n_idx, 0, max_trials)
    binom = params.mq_table[n_idx, k_idx]
    hez = params.hez_table[n_idx, k_idx]
    best_ratio = r_masked[best, jnp.arange(T)]
    return cand, best, best_ratio, binom, hez
