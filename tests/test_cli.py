"""CLI flag surface and -P parallel mode."""

import os
import subprocess
import sys

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_args_defaults_and_flags():
    from grom_tpu.cli import parse_args
    cfg = parse_args(["-i", "a.bam", "-r", "r.fa", "-o", "o.vcf", "-M",
                      "-g", "1", "-p", "4", "-v", "0.01", "-K", "0", "-S"])
    assert cfg.bam == "a.bam" and cfg.rmdup and cfg.gender == 1
    assert cfg.ploidy == 4 and cfg.pval_threshold == 0.01
    assert cfg.ranks_stdev == 0 and not cfg.splitread


def test_parse_args_missing_required(capsys):
    from grom_tpu.cli import parse_args
    assert parse_args(["-r", "r.fa", "-o", "o.vcf"]) is None


def test_cli_end_to_end(tmp_path):
    d = os.path.join(DATA, "dup60k")
    out = str(tmp_path / "o.vcf")
    r = subprocess.run([sys.executable, "-m", "grom_tpu",
                        "-i", os.path.join(d, "ds.bam"),
                        "-r", os.path.join(d, "ds.fa"),
                        "-o", out, "-M"],
                       capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    assert os.path.exists(out[:-4] + ".ctx.vcf")
    with open(os.path.join(d, "oracle.vcf")) as f:
        want = [l for l in f if not l.startswith("#")]
    with open(out) as f:
        got = [l for l in f if not l.startswith("#")]
    assert got == want


def test_cli_parallel_matches_serial(tmp_path):
    d = os.path.join(DATA, "dup60k")
    o1 = str(tmp_path / "serial.vcf")
    o2 = str(tmp_path / "par.vcf")
    base = [sys.executable, "-m", "grom_tpu",
            "-i", os.path.join(d, "ds.bam"),
            "-r", os.path.join(d, "ds.fa"), "-M"]
    r1 = subprocess.run(base + ["-o", o1], capture_output=True, text=True,
                        cwd=REPO, timeout=600)
    r2 = subprocess.run(base + ["-o", o2, "-P", "2"], capture_output=True,
                        text=True, cwd=REPO, timeout=600)
    assert r1.returncode == 0 and r2.returncode == 0, r1.stderr + r2.stderr
    rows = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert rows(o1) == rows(o2)
