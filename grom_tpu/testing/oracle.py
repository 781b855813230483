"""Run the reference GROM binary as a parity oracle.

The reference distribution ships a static x86-64 binary (reference
``dist/GROM``). We copy it to a writable cache directory (it writes its two
binomial table caches next to the executable on first run, src/GROM.c:21134+)
and invoke it on test datasets to produce golden VCFs for record-level parity
tests. Skipped automatically when the binary is unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, List, Optional, Tuple

REFERENCE_BINARY = "/root/reference/dist/GROM"
CACHE_DIR = os.path.expanduser("~/.cache/grom_oracle")


def oracle_available() -> bool:
    return os.path.exists(REFERENCE_BINARY) or os.path.exists(
        os.path.join(CACHE_DIR, "GROM"))


def _binary() -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    dst = os.path.join(CACHE_DIR, "GROM")
    if not os.path.exists(dst):
        shutil.copy(REFERENCE_BINARY, dst)
        os.chmod(dst, 0o755)
    return dst


def run_oracle(bam: str, fasta: str, out_vcf: str,
               extra_flags: Optional[List[str]] = None,
               timeout: int = 1200) -> subprocess.CompletedProcess:
    """Run reference GROM: ``GROM -i bam -r fasta -o out`` (+extra flags)."""
    cmd = [_binary(), "-i", bam, "-r", fasta, "-o", out_vcf]
    if extra_flags:
        cmd.extend(extra_flags)
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                          check=False)


def oracle_table_paths() -> Tuple[str, str]:
    """Paths of the oracle's cached binomial tables (written on first run)."""
    return (os.path.join(CACHE_DIR, "GROM_hez_binom_table_1000.txt"),
            os.path.join(CACHE_DIR, "GROM_mq_binom_table_20_1000.txt"))


def parse_vcf_records(path: str) -> List[Dict]:
    """Parse a GROM VCF into dicts (keeps GROM's FORMAT/sample columns raw)."""
    out = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            t = line.rstrip("\n").split("\t")
            rec = {"chrom": t[0], "pos": int(t[1]), "id": t[2] if len(t) > 2 else "",
                   "ref": t[3] if len(t) > 3 else "", "alt": t[4] if len(t) > 4 else "",
                   "qual": t[5] if len(t) > 5 else "", "filter": t[6] if len(t) > 6 else "",
                   "info": t[7] if len(t) > 7 else "",
                   "format": t[8] if len(t) > 8 else "",
                   "sample": t[9] if len(t) > 9 else ""}
            out.append(rec)
    return out


def split_by_class(records: List[Dict]) -> Dict[str, List[Dict]]:
    """Bucket records into snv/indel_ins/indel_del/sv/cnv classes by shape."""
    buckets: Dict[str, List[Dict]] = {"snv": [], "indel_ins": [], "indel_del": [],
                                      "sv": [], "cnv": []}
    for r in records:
        alt = r["alt"]
        if alt.startswith("<"):
            if "SD:Z:CN" in r["format"] or ":CN:" in r["format"]:
                buckets["cnv"].append(r)
            else:
                buckets["sv"].append(r)
        elif len(r["ref"]) == 1 and len(alt) == 1 and r["format"].startswith("GT:PR:AF"):
            buckets["snv"].append(r)
        elif alt and alt != "." and len(alt) >= 1 and (r["info"].startswith("END=0") or "END=0" in r["info"]):
            buckets["indel_ins"].append(r)
        elif alt == "." or alt == "":
            buckets["indel_del"].append(r)
        else:
            buckets["snv"].append(r)
    return buckets
