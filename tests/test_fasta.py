import numpy as np

from grom_tpu.ingest.fasta import (GenomeInfo, index_fasta, load_chromosome,
                                   match_chromosome, n_blocks)


def _write_fasta(tmp_path, contigs, width=60):
    p = tmp_path / "g.fa"
    with open(p, "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")
    return str(p)


def test_index_and_load(tmp_path):
    contigs = {"chr1": "ACGT" * 50 + "N" * 120 + "acgt" * 25,
               "chr2": "TTTT" * 30}
    p = _write_fasta(tmp_path, contigs)
    info = index_fasta(p, use_cache=False)
    assert info.names == ["chr1", "chr2"]
    assert info.lengths == [200 + 120 + 100, 120]
    assert info.mappable_length == 200 + 100 + 120  # non-N over both contigs
    c1 = load_chromosome(p, info, "chr1")
    assert len(c1) == 420
    assert bytes(c1[:4]) == b"ACGT"
    assert bytes(c1[-4:]) == b"acgt"  # case preserved


def test_info_cache(tmp_path):
    p = _write_fasta(tmp_path, {"c": "ACGT" * 10})
    info1 = index_fasta(p)
    info2 = index_fasta(p)  # from cache
    assert info1 == info2


def test_match_chromosome():
    names = ["chr1", "2", "chrX"]
    assert match_chromosome("chr1", names) == "chr1"
    assert match_chromosome("1", names) == "chr1"
    assert match_chromosome("chr2", names) == "2"
    assert match_chromosome("x", names) == "chrX"
    assert match_chromosome("chrM", names) is None


def test_n_blocks():
    chrom = np.frombuffer(b"A" * 50 + b"N" * 150 + b"C" * 10 + b"n" * 99 + b"G" * 5,
                          dtype=np.uint8).copy()
    blocks = n_blocks(chrom, min_n_size=100)
    assert blocks.tolist() == [[50, 200]]
    blocks2 = n_blocks(chrom, min_n_size=50)
    assert blocks2.tolist() == [[50, 200], [210, 309]]
