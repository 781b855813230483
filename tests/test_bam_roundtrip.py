"""BGZF/BAM/BAI codec roundtrip tests."""

import io
import os

import numpy as np
import pytest

from grom_tpu.ingest import bam, bgzf
from grom_tpu.ingest.bai import read_bai, reg2bin, reg2bins, region_chunks


def test_bgzf_roundtrip(tmp_path):
    payload = os.urandom(300000) + b"tail"
    p = tmp_path / "x.bgzf"
    with open(p, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(payload)
        w.close()
    data, blocks = bgzf.read_bgzf(str(p))
    assert data == payload
    assert blocks[-1, 1] == len(payload)


def test_bgzf_virtual_offsets(tmp_path):
    p = tmp_path / "x.bgzf"
    with open(p, "wb") as f:
        w = bgzf.BgzfWriter(f, block_size=100)
        marks = []
        for i in range(50):
            marks.append((w.virtual_offset, i))
            w.write(f"chunk-{i:04d};".encode())
        w.close()
    data, blocks = bgzf.read_bgzf(str(p))
    for voff, i in marks:
        flat = bgzf.virtual_to_flat(blocks, voff)
        assert data[flat:flat + 5] == f"chunk"[:5].encode()


def _toy_header():
    return bam.BamHeader("@HD\tVN:1.6\tSO:coordinate\n", ["chr1", "chr2"], [10000, 5000])


def _toy_record(name, refid, pos, seq="ACGTACGT", mapq=50, flag=0x63,
                mrefid=0, mpos=0, tlen=200, aux=b""):
    qual = bytes([30] * len(seq))
    cig = [(bam.CMATCH, len(seq))]
    return bam.encode_record(name.encode(), flag, refid, pos, mapq, cig,
                             mrefid, mpos, tlen, seq.encode(), qual, aux)


def test_bam_roundtrip(tmp_path):
    p = str(tmp_path / "t.bam")
    w = bam.BamWriter(p, _toy_header())
    for i in range(100):
        pos = 10 * i
        rec = _toy_record(f"r{i}", 0, pos, mpos=pos + 100)
        w.write_record(0, pos, pos + 8, rec)
    w.close()

    header, reads = bam.read_bam(p)
    assert header.ref_names == ["chr1", "chr2"]
    assert len(reads) == 100
    assert reads.pos[3] == 30
    assert reads.names[7] == b"r7"
    assert reads.seq_of(0) == b"ACGTACGT"
    assert list(reads.qual_of(0)) == [30] * 8
    cig = reads.cigar_of(5)
    assert len(cig) == 1 and (cig[0] >> 4) == 8 and (cig[0] & 0xF) == bam.CMATCH
    assert os.path.exists(p + ".bai")


def test_bam_aux_sa_tag(tmp_path):
    p = str(tmp_path / "t.bam")
    w = bam.BamWriter(p, _toy_header())
    aux = b"SAZchr2,100,+,50M50S,60,0;\x00"
    rec = _toy_record("r0", 0, 5, aux=aux)
    w.write_record(0, 5, 13, rec)
    w.close()
    _, reads = bam.read_bam(p)
    assert reads.sa_tags[0] == b"chr2,100,+,50M50S,60,0;"


def test_bai_query(tmp_path):
    p = str(tmp_path / "t.bam")
    w = bam.BamWriter(p, _toy_header())
    for i in range(500):
        pos = 17 * i
        rec = _toy_record(f"r{i}", 0, pos)
        w.write_record(0, pos, pos + 8, rec)
    w.close()
    refs = read_bai(p + ".bai")
    data, blocks = bgzf.read_bgzf(p)
    _, hdr_end = bam.decode_header(data)
    chunks = region_chunks(refs, 0, 1000, 1200)
    assert chunks
    got = []
    for vs, ve in chunks:
        s = bgzf.virtual_to_flat(blocks, vs)
        e = bgzf.virtual_to_flat(blocks, ve)
        rr = bam.decode_records(data, s, e)
        got.extend(rr.pos.tolist())
    # all reads overlapping [1000, 1200) must be present
    want = [17 * i for i in range(500) if 17 * i < 1200 and 17 * i + 8 > 1000]
    assert set(want) <= set(got)


def test_reg2bin_consistency():
    assert reg2bin(0, 1) == 4681
    for beg, end in [(0, 1), (100, 200), (16383, 16385), (1 << 20, (1 << 20) + 5000)]:
        assert reg2bin(beg, end) in reg2bins(beg, end)


def test_block_table_sidecar(tmp_path, monkeypatch):
    """BgzfRandomReader persists its block table as <bam>.grom_tpu.bgzf.npz
    for memmap'd (WGS-scale) sources — so -P workers skip the whole-file
    scan — and invalidates it when the source file changes."""
    from grom_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("sidecar rides the native memmap path")
    monkeypatch.setenv("GROM_TPU_SRC_MMAP_MIN", "0")   # force memmap here
    p = str(tmp_path / "x.bgzf")
    with open(p, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(os.urandom(300000))
        w.close()
    r1 = bgzf.BgzfRandomReader(p)
    side = p + ".grom_tpu.bgzf.npz"
    assert os.path.exists(side)
    r2 = bgzf.BgzfRandomReader(p)           # loads the sidecar
    assert np.array_equal(r1._coff, r2._coff)
    assert np.array_equal(r1._usize, r2._usize)
    assert np.array_equal(r1._uoff, r2._uoff)
    # content equality through the sidecar path
    assert r1.inflate_blocks(0, r1.n_blocks) == \
        r2.inflate_blocks(0, r2.n_blocks)

    # stale sidecar: rewrite the source with different content/size
    with open(p, "wb") as f:
        w = bgzf.BgzfWriter(f)
        w.write(os.urandom(123456))
        w.close()
    now = os.path.getmtime(p)
    os.utime(side, (now - 10, now - 10))    # force sidecar older than source
    r3 = bgzf.BgzfRandomReader(p)
    assert int(r3._uoff[-1]) == 123456      # rescanned, not the stale table

    # corrupt sidecar must be ignored, not fatal
    with open(side, "wb") as f:
        f.write(b"not an npz")
    os.utime(side, None)
    r4 = bgzf.BgzfRandomReader(p)
    assert int(r4._uoff[-1]) == 123456
