#!/usr/bin/env python
"""Run ONE -P worker job in this process — exactly cli._run_one_chromosome
with the env run_parallel would give it — for memory/wall iteration on a
single chromosome without paying a full multi-chromosome -P run.

Usage:
    python tools/worker_probe.py <bam> <fasta> <chrom-name> [out.part]

Pair with tools/memprof.py for peak-RSS attribution:
    python tools/memprof.py --tag bam=<bam> -- \
        python tools/worker_probe.py <bam> <fasta> chr1
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    bam, fa, chrom = sys.argv[1:4]
    part = sys.argv[4] if len(sys.argv) > 4 else "/tmp/worker_probe.part"
    if "GROM_TPU_POOL_CAP" not in os.environ:
        # what run_parallel computes for -P <cpus> (cli.py): half of
        # physical RAM / P, ceiling 4GiB
        half = (os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")) // 2
        per = max(64 << 20, half // max(os.cpu_count() or 2, 1))
        os.environ["GROM_TPU_POOL_CAP"] = str(min(per, 4 << 30))
    from grom_tpu import cli
    from grom_tpu.config import GromConfig
    from grom_tpu.ingest import bam as bam_mod
    header = bam_mod.read_bam_header(bam)
    refid = header.ref_names.index(chrom)
    cfg = GromConfig().replace(bam=bam, ref_fasta=fa, out_vcf=part)
    if not os.path.exists(bam + ".grom_tpu.mean.json"):
        # what the -P parent does before spawning (run_parallel)
        from grom_tpu.driver import _streaming_insert_stats
        _streaming_insert_stats(cfg, header)
    key, path, n, ctx = cli._run_one_chromosome(
        (cfg.to_json(), refid, 0, None, None, part))
    print("rows=%d ctx=%d part=%s" % (n, len(ctx), path))
    from grom_tpu.utils import timing
    if timing.timing_enabled():
        timing.report()


if __name__ == "__main__":
    main()
