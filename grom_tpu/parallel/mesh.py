"""Multi-chip sharding of the calling pipeline.

The genome is the sequence axis. We shard over a 2D mesh:
  * ``dp`` — genome tiles (the reference's per-chromosome/сub-region fork
    parallelism, src/GROM.c:354-624, re-expressed as data parallelism);
  * ``sp`` — segments within a tile (the reference's sliding-window memory
    trick, src/GROM.c:5846-6402, re-expressed as sequence parallelism).

Collectives:
  * span-depth accumulation needs a carry across ``sp`` shards — computed
    with an all_gather of local endpoint-delta sums and an exclusive prefix
    (the reference's analogue: the 10kb overlap halo between sub-regions,
    src/GROM.c:75-78);
  * genome-wide statistics (depth histogram for the GC/CNV distributions)
    reduce with psum over both axes (the reference concatenates per-child
    files instead, src/GROM.c:603-624).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grom_tpu.ops.pileup import PileupEvents, PileupTile, pileup_tile


def make_mesh(n_dp: int, n_sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_sp, "not enough devices"
    arr = np.array(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(arr, ("dp", "sp"))


class ShardedBatch(NamedTuple):
    """Events pre-bucketed by (tile, segment). Shapes:
    ev_*: [n_tiles, n_seg, E] with segment-local positions;
    span_s/e/w: [n_tiles, n_seg, S] endpoint spans, segment-local, clipped.
    """
    ev_pos: jnp.ndarray
    ev_code: jnp.ndarray
    ev_qual: jnp.ndarray
    ev_mapq: jnp.ndarray
    ev_hi: jnp.ndarray
    ev_counted: jnp.ndarray
    ev_mismatch: jnp.ndarray
    ev_fwd: jnp.ndarray
    ev_pir: jnp.ndarray
    span_d: jnp.ndarray      # [n_tiles, n_seg, seg_size+1] precomputed deltas


def build_sharded_step(mesh: Mesh, seg_size: int, max_trials: int = 1000):
    """Returns a jitted function running one calling step over the mesh:
    per-segment pileup + depth with cross-``sp`` carry + a psum'd global depth
    histogram (the all-reduce the CNV GC distributions need)."""

    from jax.experimental.shard_map import shard_map

    def step(ev_pos, ev_code, ev_qual, ev_mapq, ev_hi, ev_counted,
             ev_mismatch, ev_fwd, ev_pir, span_d, mq_table, hez_table,
             ref_code):
        # local block: [tiles_local, seg_local, ...]
        def seg_fn(pos, code, qual, mapq, hi, counted, mism, fwd, pir, sd, rc):
            ev = PileupEvents(pos, code, qual, mapq, hi, counted, mism, fwd, pir)
            tile = pileup_tile(ev, seg_size)
            # local span depth deltas → local cumsum + carry over sp
            local = jnp.cumsum(sd[:seg_size])
            total = sd.sum()
            return tile, local, total

        tiles, locals_, totals = jax.vmap(jax.vmap(
            seg_fn, in_axes=0), in_axes=0)(
            ev_pos, ev_code, ev_qual, ev_mapq, ev_hi, ev_counted,
            ev_mismatch, ev_fwd, ev_pir, span_d, ref_code)

        # carry across sp shards: exclusive prefix of segment totals
        seg_totals = jax.lax.all_gather(totals, "sp", axis=1, tiled=True)
        # seg_totals: [tiles_local, n_seg_global]
        prefix = jnp.cumsum(seg_totals, axis=1) - seg_totals
        my_sp = jax.lax.axis_index("sp")
        n_local = totals.shape[1]
        start = my_sp * n_local
        my_prefix = jax.lax.dynamic_slice_in_dim(prefix, start, n_local, axis=1)
        depth = locals_ + my_prefix[:, :, None]

        # global depth histogram (for GC-binned CNV stats): psum over mesh
        hist = jnp.zeros(256, jnp.int32).at[jnp.clip(depth, 0, 255)].add(1)
        hist = jax.lax.psum(jax.lax.psum(hist, "sp"), "dp")

        # SNV scoring on the local segments
        counts = tiles.snv
        total = counts.sum(axis=2)
        k = counts.max(axis=2)
        n_idx = jnp.clip(total, 0, max_trials)
        k_idx = jnp.clip(k, 0, max_trials)
        binom = mq_table[n_idx, k_idx]
        return depth, hist, binom

    return shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", "sp"),) * 10 + (P(), P(), P("dp", "sp")),
        out_specs=(P("dp", "sp"), P(), P("dp", "sp")),
        check_rep=False)


def demo_batch(n_tiles: int, n_seg: int, seg_size: int, events_per_seg: int,
               seed: int = 0) -> Tuple:
    """Tiny synthetic sharded batch for dry-run compilation."""
    rng = np.random.default_rng(seed)
    shape = (n_tiles, n_seg, events_per_seg)
    pos = rng.integers(0, seg_size, shape).astype(np.int32)
    code = rng.integers(0, 4, shape).astype(np.int8)
    qual = rng.integers(20, 40, shape).astype(np.int32)
    mapq = np.full(shape, 60, np.int32)
    hi = np.ones(shape, bool)
    counted = np.ones(shape, bool)
    mism = rng.random(shape) < 0.01
    fwd = rng.random(shape) < 0.5
    pir = rng.integers(0, 100, shape).astype(np.int32)
    span_d = np.zeros((n_tiles, n_seg, seg_size + 1), np.int32)
    starts = rng.integers(0, seg_size, shape)
    np.add.at(span_d, (np.arange(n_tiles)[:, None, None].repeat(n_seg, 1).repeat(events_per_seg, 2),
                       np.arange(n_seg)[None, :, None].repeat(n_tiles, 0).repeat(events_per_seg, 2),
                       starts), 1)
    ref_code = rng.integers(0, 4, (n_tiles, n_seg, seg_size)).astype(np.int8)
    return (pos, code, qual, mapq, hi, counted, mism, fwd, pir, span_d, ref_code)
