"""Synthetic genome + paired-end read simulator producing sorted BAM+BAI.

The reference ships no simulator (its only test is a golden file whose BAM is
a missing blob); this module generates ground-truthed datasets that both the
reference binary (as an oracle) and this engine can be run on, enabling
record-level parity tests for every variant class.

Simulation model: build a reference contig, apply variants to produce one or
two haplotypes, keep the exact alt→ref collinear block map, then sample
fragments from the haplotypes and map read ends through the block map the way
an idealized BWA-mem would: collinear small gaps become I/D cigar ops,
large/strand-breaking gaps become soft-clips + SA split tags, pairs spanning
SV junctions become discordant.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from grom_tpu.ingest import bam
from grom_tpu.ingest.bam import (BamHeader, BamWriter, CDEL, CINS, CMATCH,
                                 CSOFT_CLIP, FDUP, FMREVERSE, FMUNMAP, FPAIRED,
                                 FPROPER_PAIR, FREAD1, FREAD2, FREVERSE, FUNMAP)

_COMP = bytes.maketrans(b"ACGTacgtN", b"TGCAtgcaN")


def revcomp(s: bytes) -> bytes:
    return s.translate(_COMP)[::-1]


def random_genome(rng: np.random.Generator, length: int,
                  gc_block: int = 20000, n_blocks: int = 2,
                  n_block_len: int = 500, softmask_frac: float = 0.1) -> bytes:
    """Reference contig with regionally varying GC, N blocks and soft-masked
    (lowercase) spans — enough structure to exercise the GC-normalization and
    N-handling paths."""
    nblk = length // gc_block + 1
    gc = np.clip(rng.normal(0.42, 0.12, nblk), 0.15, 0.8)
    gc_per_base = np.repeat(gc, gc_block)[:length]
    r = rng.random(length)
    is_gc = r < gc_per_base
    r2 = rng.random(length)
    arr = np.where(is_gc, np.where(r2 < 0.5, ord("G"), ord("C")),
                   np.where(r2 < 0.5, ord("A"), ord("T"))).astype(np.uint8)
    # soft-masked spans
    pos = 0
    while pos < length:
        if rng.random() < softmask_frac:
            span = int(rng.integers(200, 2000))
            arr[pos:pos + span] |= 0x20  # lowercase
            pos += span
        pos += int(rng.integers(5000, 20000))
    # N blocks
    for _ in range(n_blocks):
        s = int(rng.integers(length // 10, length - n_block_len))
        arr[s:s + n_block_len] = ord("N")
    return arr.tobytes()


@dataclass
class Variant:
    kind: str          # 'snv' | 'ins' | 'del' | 'sv_del' | 'sv_dup' | 'sv_inv' | 'sv_ins'
    pos: int           # 0-based ref position (start)
    ref: bytes = b""
    alt: bytes = b""
    end: int = 0       # ref end for span variants
    genotype: int = 2  # 1 = het (haplotype 1 only), 2 = hom (both)

    def to_dict(self):
        d = dataclasses.asdict(self)
        d["ref"] = self.ref.decode()
        d["alt"] = self.alt.decode()
        return d


@dataclass
class Block:
    """Collinear alt→ref block. alt[a0:a1] aligns to ref[r0:r1); strand=+1
    forward, -1 means alt segment is the reverse complement of ref[r0:r1)."""
    a0: int
    a1: int
    r0: int
    r1: int
    strand: int = 1


@dataclass
class Haplotype:
    seq: bytes
    blocks: List[Block]


def _rand_seq(rng, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).tobytes())


def plant_variants(rng: np.random.Generator, ref: bytes,
                   snv_rate: float = 1e-3, indel_rate: float = 1e-4,
                   n_sv_del: int = 2, n_sv_dup: int = 2, n_sv_inv: int = 2,
                   n_sv_ins: int = 2, sv_len: Tuple[int, int] = (400, 3000),
                   hom_frac: float = 0.4) -> Tuple[List[Variant], List[Haplotype]]:
    """Choose variants and build the two haplotypes with block maps."""
    L = len(ref)
    refu = ref.upper()
    variants: List[Variant] = []
    used = np.zeros(L, dtype=bool)
    refa = np.frombuffer(ref, dtype=np.uint8)
    is_n = (refa == ord("N")) | (refa == ord("n"))

    def reserve(s, e, pad=150) -> bool:
        s0, e0 = max(0, s - pad), min(L, e + pad)
        if used[s0:e0].any() or is_n[s0:e0].any():
            return False
        used[s0:e0] = True
        return True

    # SVs first (they occupy big spans)
    specs = ([("sv_del", n_sv_del), ("sv_dup", n_sv_dup),
              ("sv_inv", n_sv_inv), ("sv_ins", n_sv_ins)])
    for kind, count in specs:
        for _ in range(count):
            for _attempt in range(50):
                ln = int(rng.integers(sv_len[0], sv_len[1]))
                s = int(rng.integers(1000, L - ln - 1000))
                if reserve(s, s + ln, pad=600):
                    gt = 2 if rng.random() < hom_frac else 1
                    if kind == "sv_ins":
                        variants.append(Variant(kind, s, b"", _rand_seq(rng, ln), s, gt))
                    else:
                        variants.append(Variant(kind, s, b"", b"", s + ln, gt))
                    break

    # small indels
    n_indel = rng.poisson(indel_rate * L)
    for _ in range(n_indel):
        for _attempt in range(20):
            s = int(rng.integers(500, L - 500))
            ln = int(rng.integers(1, 11))
            if reserve(s, s + ln + 1, pad=60):
                gt = 2 if rng.random() < hom_frac else 1
                if rng.random() < 0.5:
                    variants.append(Variant("ins", s, b"", _rand_seq(rng, ln), s, gt))
                else:
                    variants.append(Variant("del", s, refu[s:s + ln], b"", s + ln, gt))
                break

    # SNVs
    n_snv = rng.poisson(snv_rate * L)
    bases = b"ACGT"
    for _ in range(n_snv):
        for _attempt in range(10):
            s = int(rng.integers(100, L - 100))
            if not used[s] and not is_n[s]:
                used[s] = True
                rb = refu[s:s + 1]
                if rb not in (b"A", b"C", b"G", b"T"):
                    continue
                alt = rb
                while alt == rb:
                    alt = bases[rng.integers(4):][:1]
                gt = 2 if rng.random() < hom_frac else 1
                variants.append(Variant("snv", s, rb, alt, s + 1, gt))
                break

    variants.sort(key=lambda v: v.pos)

    haps = [_build_haplotype(ref, [v for v in variants if v.genotype == 2 or h == 0])
            for h in range(2)]
    return variants, haps


def _build_haplotype(ref: bytes, variants: List[Variant]) -> Haplotype:
    """Apply variants left→right, maintaining the alt→ref block map.
    SNVs don't split blocks (they're substitutions inside M runs)."""
    out = bytearray()
    blocks: List[Block] = []
    cur_ref = 0  # next un-consumed ref base
    seg_ref_start = 0

    def close_block(upto_ref: int):
        nonlocal seg_ref_start
        if upto_ref > seg_ref_start:
            a1 = len(out) + (upto_ref - seg_ref_start)
            blocks.append(Block(len(out), a1, seg_ref_start, upto_ref, 1))
            out.extend(ref[seg_ref_start:upto_ref])
        seg_ref_start = upto_ref

    snv_positions: List[Tuple[int, int]] = []  # (out_offset, alt_base)

    for v in variants:
        if v.kind == "snv":
            # substitute within the running block — record and apply later
            close_block(v.pos)  # ensure block boundaries align… no: SNVs shouldn't split
            # (closing at pos then continuing keeps map correct and merge-able)
            snv_positions.append((len(out), v.alt[0]))
            out.append(v.alt[0])
            blocks.append(Block(len(out) - 1, len(out), v.pos, v.pos + 1, 1))
            seg_ref_start = v.pos + 1
            cur_ref = v.pos + 1
        elif v.kind in ("ins", "sv_ins"):
            close_block(v.pos)
            out.extend(v.alt)
            seg_ref_start = v.pos
            cur_ref = v.pos
        elif v.kind in ("del", "sv_del"):
            close_block(v.pos)
            seg_ref_start = v.end
            cur_ref = v.end
        elif v.kind == "sv_dup":
            # tandem duplication: ref[pos:end] appears twice
            close_block(v.end)
            blocks.append(Block(len(out), len(out) + (v.end - v.pos), v.pos, v.end, 1))
            out.extend(ref[v.pos:v.end])
            seg_ref_start = v.end
            cur_ref = v.end
        elif v.kind == "sv_inv":
            close_block(v.pos)
            seg = revcomp(ref[v.pos:v.end])
            blocks.append(Block(len(out), len(out) + len(seg), v.pos, v.end, -1))
            out.extend(seg)
            seg_ref_start = v.end
            cur_ref = v.end
    close_block(len(ref))

    # merge adjacent collinear forward blocks (SNV splits) for clean mapping
    merged: List[Block] = []
    for b in blocks:
        if (merged and merged[-1].strand == 1 and b.strand == 1
                and merged[-1].a1 == b.a0 and merged[-1].r1 == b.r0):
            merged[-1] = Block(merged[-1].a0, b.a1, merged[-1].r0, b.r1, 1)
        else:
            merged.append(b)
    return Haplotype(bytes(out), merged)


# ---------------------------------------------------------------------------
# Read mapping through the block map (idealized BWA-mem)
# ---------------------------------------------------------------------------

@dataclass
class Alignment:
    refid: int
    pos: int
    strand: int            # +1 fwd, -1 rev (in ref space)
    cigar: List[Tuple[int, int]]   # (op, len) — includes soft clips
    seq: bytes             # SEQ as stored (ref-forward orientation)
    qual: bytes
    sa: Optional[str] = None  # SA tag payload of the other piece
    mapq: int = 60

    @property
    def ref_span(self) -> int:
        return sum(l for op, l in self.cigar if op in (CMATCH, CDEL))

    @property
    def end(self) -> int:
        return self.pos + self.ref_span


def _cigar_str(cigar: List[Tuple[int, int]]) -> str:
    return "".join(f"{l}{bam.CIGAR_CHARS[op]}" for op, l in cigar)


def map_read(hap: Haplotype, a0: int, a1: int, frag_strand: int,
             seq_alt: bytes, qual_alt: bytes, chrom: str,
             max_indel: int = 50, min_piece: int = 20) -> Optional[Alignment]:
    """Map alt-interval [a0,a1) to a primary alignment.

    ``seq_alt``/``qual_alt`` are in ALT-FORWARD orientation (hap[a0:a1] with
    errors applied). A BAM record stores SEQ in ref-forward orientation, which
    depends only on the mapped block's strand; ``frag_strand`` (which end of
    the fragment this is) only affects the FLAG strand bit:
    read_strand = frag_strand * block_strand.
    """
    # pieces of the read in alt space intersected with blocks
    pieces = []  # (alt_s, alt_e, block)
    for b in hap.blocks:
        s, e = max(a0, b.a0), min(a1, b.a1)
        if e > s:
            pieces.append((s, e, b))
    if not pieces:
        return None

    # try to merge collinear forward pieces into one gapped alignment
    def ref_of(piece):
        s, e, b = piece
        if b.strand == 1:
            return b.r0 + (s - b.a0), b.r0 + (e - b.a0)
        else:
            return b.r1 - (e - b.a0), b.r1 - (s - b.a0)

    groups: List[List[int]] = [[0]]
    for i in range(1, len(pieces)):
        ps, pe, pb = pieces[i]
        qs, qe, qb = pieces[groups[-1][-1]]
        r_prev = ref_of(pieces[groups[-1][-1]])
        r_cur = ref_of(pieces[i])
        alt_gap = ps - qe
        ref_gap = r_cur[0] - r_prev[1]
        if (pb.strand == 1 and qb.strand == 1 and 0 <= alt_gap <= max_indel
                and -0 <= ref_gap <= max_indel and (alt_gap == 0 or ref_gap == 0)):
            groups[-1].append(i)
        else:
            groups.append([i])

    # primary group = most aligned alt bases
    def group_len(g):
        return sum(pieces[i][1] - pieces[i][0] for i in g)

    groups.sort(key=group_len, reverse=True)
    prim = groups[0]
    prim_strand = pieces[prim[0]][2].strand

    # Build primary cigar in ALT coordinates then orient.
    first_s = pieces[prim[0]][0]
    last_e = pieces[prim[-1]][1]
    cigar_alt: List[Tuple[int, int]] = []
    if first_s > a0:
        cigar_alt.append((CSOFT_CLIP, first_s - a0))
    for j, i in enumerate(prim):
        s, e, b = pieces[i]
        if j > 0:
            ps, pe, pb = pieces[prim[j - 1]]
            alt_gap = s - pe
            r_prev = ref_of(pieces[prim[j - 1]])
            r_cur = ref_of(pieces[i])
            ref_gap = (r_cur[0] - r_prev[1]) if b.strand == 1 else (r_prev[0] - r_cur[1])
            if alt_gap > 0:
                cigar_alt.append((CINS, alt_gap))
            if ref_gap > 0:
                cigar_alt.append((CDEL, ref_gap))
        if cigar_alt and cigar_alt[-1][0] == CMATCH:
            cigar_alt[-1] = (CMATCH, cigar_alt[-1][1] + (e - s))
        else:
            cigar_alt.append((CMATCH, e - s))
    if a1 > last_e:
        cigar_alt.append((CSOFT_CLIP, a1 - last_e))

    if prim_strand == 1:
        rs = ref_of(pieces[prim[0]])[0]
    else:
        rs = ref_of(pieces[prim[-1]])[0]

    # Stored SEQ must equal ref-forward content: depends only on block strand.
    read_strand = frag_strand * prim_strand
    if prim_strand == 1:
        stored_seq, stored_qual = seq_alt, qual_alt
        cigar = list(cigar_alt)
    else:
        stored_seq, stored_qual = revcomp(seq_alt), qual_alt[::-1]
        cigar = list(reversed(cigar_alt))

    sa = None
    if len(groups) > 1:
        g2 = groups[1]
        if group_len(g2) >= min_piece:
            s2, e2, b2 = pieces[g2[0]]
            r2 = ref_of(pieces[g2[0]])
            # The supplementary record's SEQ is ref-forward too, so its cigar
            # clip order flips iff b2.strand == -1; its FLAG strand (the SA
            # strand char) is b2.strand * frag_strand.
            sa_strand = b2.strand * frag_strand
            pre = s2 - a0
            post = a1 - pieces[g2[-1]][1]
            m = sum(pieces[i][1] - pieces[i][0] for i in g2)
            if b2.strand == 1:
                sa_cig = ([(CSOFT_CLIP, pre)] if pre else []) + [(CMATCH, m)] + \
                    ([(CSOFT_CLIP, post)] if post else [])
                sa_pos = r2[0]
            else:
                sa_cig = ([(CSOFT_CLIP, post)] if post else []) + [(CMATCH, m)] + \
                    ([(CSOFT_CLIP, pre)] if pre else [])
                sa_pos = ref_of(pieces[g2[-1]])[0] if len(g2) > 1 else r2[0]
            strand_ch = "+" if sa_strand == 1 else "-"
            sa = f"{chrom},{sa_pos + 1},{strand_ch},{_cigar_str(sa_cig)},60,0;"

    return Alignment(0, rs, read_strand, cigar, stored_seq, stored_qual, sa)


# ---------------------------------------------------------------------------
# Fragment sampling + BAM writing
# ---------------------------------------------------------------------------

@dataclass
class SimConfig:
    coverage: float = 30.0
    read_len: int = 100
    insert_mean: int = 300
    insert_sd: int = 30
    err_rate: float = 0.002
    low_bq_rate: float = 0.02
    low_mapq_rate: float = 0.01
    dup_rate: float = 0.0
    seed: int = 0


def simulate_bam(out_prefix: str, ref: bytes, chrom: str,
                 variants: List[Variant], haps: List[Haplotype],
                 sim: SimConfig) -> Tuple[str, str]:
    """Write ``<prefix>.fa``, ``<prefix>.bam`` (+.bai). Returns (fa, bam)."""
    rng = np.random.default_rng(sim.seed)
    fa_path = out_prefix + ".fa"
    with open(fa_path, "w") as f:
        f.write(f">{chrom}\n")
        s = ref.decode()
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")

    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n"
                       f"@SQ\tSN:{chrom}\tLN:{len(ref)}\n"
                       "@PG\tID:grom_tpu_sim\tPN:grom_tpu_sim\n",
                       [chrom], [len(ref)])

    L = sim.read_len
    records = []  # (pos, encoded, refid, end)
    n_frags = int(sim.coverage * sum(len(h.seq) for h in haps) / (2 * 2 * L))
    name_i = 0
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    for hap_i, hap in enumerate(haps):
        hl = len(hap.seq)
        hap_seq = np.frombuffer(hap.seq.upper(), dtype=np.uint8)
        count = n_frags
        starts = rng.integers(0, hl - 1, count)
        inserts = np.maximum(rng.normal(sim.insert_mean, sim.insert_sd, count).astype(int), L + 2)
        for fi in range(count):
            fs = int(starts[fi])
            fe = fs + int(inserts[fi])
            if fe > hl:
                continue
            name = f"sim{hap_i}_{name_i:07d}".encode()
            name_i += 1
            is_dup = rng.random() < sim.dup_rate and fi > 0
            ends = []
            for end_i, (a0, a1, frag_strand) in enumerate(
                    [(fs, fs + L, 1), (fe - L, fe, -1)]):
                piece = hap_seq[a0:a1].copy()
                # sequencing errors
                errs = np.flatnonzero(rng.random(L) < sim.err_rate)
                for e in errs:
                    piece[e] = bases[int(rng.integers(4))]
                qual = np.full(L, 35, dtype=np.uint8)
                lowq = rng.random(L) < sim.low_bq_rate
                qual[lowq] = rng.integers(2, 19, int(lowq.sum()))
                qual[errs] = np.minimum(qual[errs], np.maximum(
                    rng.integers(10, 40, len(errs)).astype(np.uint8), 2))
                aln = map_read(hap, a0, a1, frag_strand, piece.tobytes(),
                               qual.tobytes(), chrom)
                ends.append(aln)
            if ends[0] is None or ends[1] is None:
                continue
            r1, r2 = ends
            mapq = 60
            if rng.random() < sim.low_mapq_rate:
                mapq = int(rng.integers(0, 19))
            for r in (r1, r2):
                r.mapq = mapq

            # pair-level fields
            same_chr = True
            p1, p2 = r1.pos, r2.pos
            e1, e2 = r1.end, r2.end
            lo, hi = min(p1, p2), max(e1, e2)
            tl = hi - lo
            fr = (r1.strand == 1 and r2.strand == -1 and p1 <= p2) or \
                 (r2.strand == 1 and r1.strand == -1 and p2 <= p1)
            proper = fr and tl < sim.insert_mean + 4 * sim.insert_sd and tl >= L
            for idx, (r, m) in enumerate(((r1, r2), (r2, r1))):
                flag = FPAIRED | (FREAD1 if idx == 0 else FREAD2)
                if proper:
                    flag |= FPROPER_PAIR
                if r.strand == -1:
                    flag |= FREVERSE
                if m.strand == -1:
                    flag |= FMREVERSE
                if is_dup:
                    flag |= FDUP
                if r.pos < m.pos or (r.pos == m.pos and idx == 0):
                    tlen = tl
                else:
                    tlen = -tl
                aux = b""
                if r.sa:
                    aux = b"SAZ" + r.sa.encode() + b"\x00"
                rec = bam.encode_record(name, flag, 0, r.pos, r.mapq, r.cigar,
                                        0, m.pos, tlen, r.seq, r.qual, aux)
                records.append((r.pos, rec, 0, r.end))

    records.sort(key=lambda t: t[0])
    bam_path = out_prefix + ".bam"
    w = BamWriter(bam_path, header)
    for pos, rec, refid, end in records:
        w.write_record(refid, pos, end, rec)
    w.close()
    return fa_path, bam_path


def quick_dataset(out_prefix: str, length: int = 400_000, seed: int = 1,
                  sim: Optional[SimConfig] = None, **variant_kw):
    """One-call dataset: genome + variants + BAM. Returns (fa, bam, variants)."""
    rng = np.random.default_rng(seed)
    ref = random_genome(rng, length)
    variants, haps = plant_variants(rng, ref, **variant_kw)
    sim = sim or SimConfig(seed=seed + 1)
    fa, bam_path = simulate_bam(out_prefix, ref, "chrSim", variants, haps, sim)
    return fa, bam_path, variants
