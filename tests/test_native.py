"""Native C++ library vs Python reference implementations."""

import gzip

import numpy as np
import pytest

from fulgor_tpu.build import ccdbg as C
from fulgor_tpu.core import kmers as K
from fulgor_tpu.native import lib as N
from tests.test_ccdbg import random_genomes


def write_fasta(path, seqs, gz=False, width=0):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">seq{i} extra comment\n")
            if width:
                for j in range(0, len(s), width):
                    f.write(s[j : j + width] + "\n")
            else:
                f.write(s + "\n")


@pytest.mark.parametrize("gz,width", [(False, 0), (True, 17)])
def test_native_ccdbg_matches_python(tmp_path, rng, gz, width):
    k = 15
    genomes = random_genomes(rng, num_colors=5, length=800, k=k)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp_path / f"g{i}.fa{'.gz' if gz else ''}")
        write_fasta(p, seqs, gz=gz, width=width)
        paths.append(p)
    got = N.build_ccdbg(paths, k)
    ref = C.build_ccdbg_py(genomes, k)
    np.testing.assert_array_equal(got["unitig_offs"], ref.unitig_offs)
    np.testing.assert_array_equal(got["unitig_codes"], ref.unitig_codes)
    np.testing.assert_array_equal(got["unitig_cs"], ref.unitig_cs)
    np.testing.assert_array_equal(got["cs_colors"], ref.cs_colors)
    np.testing.assert_array_equal(got["cs_offs"], ref.cs_offs)
    assert got["num_kmers"] == ref.num_kmers


def test_native_ccdbg_ns_and_multirecord(tmp_path, rng):
    k = 11
    genomes = [
        ["ACGTACGTACGTACGAATTTGGCCA", "TTTTGGGGCCCCAAAAGGTTTACGT"],
        ["ACGTACGTANNNCGTACGAATTGCACGTACGTACG"],
    ]
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp_path / f"g{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    got = N.build_ccdbg(paths, k)
    ref = C.build_ccdbg_py(genomes, k)
    np.testing.assert_array_equal(got["unitig_codes"], ref.unitig_codes)
    np.testing.assert_array_equal(got["unitig_cs"], ref.unitig_cs)
    np.testing.assert_array_equal(got["cs_colors"], ref.cs_colors)


def test_cuckoo_table(rng):
    from fulgor_tpu.query.host_lookup import lookup_host

    n = 5000
    keys = np.unique(rng.integers(0, 1 << 62, size=n).astype(np.uint64))
    vals = rng.integers(0, 1 << 10, size=len(keys)).astype(np.uint32)
    table = N.cuckoo_build(keys, vals)
    nb = table.shape[0]
    assert nb & (nb - 1) == 0  # quotient layout requires pow2 buckets
    np.testing.assert_array_equal(lookup_host(table, keys), vals)
    # misses stay misses (quotienting must not create false positives)
    miss = rng.integers(0, 1 << 62, size=20000).astype(np.uint64)
    miss = miss[~np.isin(miss, keys)]
    assert (lookup_host(table, miss) == 0xFFFFFFFF).all()
    # slots used == number of keys
    slots = table.view(np.uint64).reshape(nb, 2)
    b = nb.bit_length() - 1
    val_mask = np.uint64((1 << (b + 1)) - 1)
    filled = int(((slots & val_mask) != val_mask).sum())
    assert filled == len(keys)


def test_parse_reads_fastq(tmp_path):
    p = tmp_path / "reads.fq.gz"
    with gzip.open(p, "wt") as f:
        f.write("@r0 desc\nACGTACGT\n+\nIIIIIIII\n")
        f.write("@r1\nTTNGA\n+anything\nIIIII\n")
    codes, lens, names = N.parse_reads(str(p))
    assert names == ["r0", "r1"]
    np.testing.assert_array_equal(lens, [8, 5])
    np.testing.assert_array_equal(codes[0], K.seq_to_codes("ACGTACGT"))
    np.testing.assert_array_equal(codes[1][:5], K.seq_to_codes("TTNGA"))
    assert (codes[1][5:] == 4).all()


def test_parse_reads_fasta_multiline(tmp_path):
    p = tmp_path / "reads.fa"
    with open(p, "w") as f:
        f.write(">a x\nACGT\nACG\n>b\nTTTT\n")
    codes, lens, names = N.parse_reads(str(p))
    assert names == ["a", "b"]
    np.testing.assert_array_equal(lens, [7, 4])
    np.testing.assert_array_equal(codes[0], K.seq_to_codes("ACGTACG"))


def test_multipass_build_equivalence(tmp_path, rng):
    """Multi-pass (RAM-bounded) ccdBG build must produce bit-identical
    output to the single-pass build."""
    k = 15
    genomes = random_genomes(rng, num_colors=5, length=900, k=k)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp_path / f"g{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    ref = N.build_ccdbg(paths, k, num_passes=1)
    for passes in (2, 5, 16):
        got = N.build_ccdbg(paths, k, num_passes=passes)
        for key in ("unitig_codes", "unitig_offs", "unitig_cs", "cs_colors", "cs_offs"):
            np.testing.assert_array_equal(got[key], ref[key], err_msg=f"passes={passes} {key}")
        assert got["num_kmers"] == ref["num_kmers"]


def test_format_psa_ascii_unmapped_bulk():
    """Regression: 32k+ lines of wide qids with EMPTY color lists must not
    overflow the formatter's buffer (the fixed 'qid\\tcount\\n' part needs up
    to 22 bytes/line)."""
    n = 40000
    qids = (np.arange(n, dtype=np.uint32) + 4_000_000_000)  # 10-digit ids
    offs = np.zeros(n + 1, dtype=np.int64)  # all empty
    out = N.format_psa_ascii(qids, np.empty(0, np.uint32), offs)
    lines = out.decode().splitlines()
    assert len(lines) == n
    assert lines[0] == "4000000000\t0"
    assert lines[-1] == f"{4_000_000_000 + n - 1}\t0"


def test_reads_stream_long_names(tmp_path):
    """FASTQ headers longer than the default 64 B/read budget must come
    through exactly (the stream grows its name buffer, never truncates)."""
    p = tmp_path / "longnames.fq"
    names = ["r" + str(i) + "_" + "x" * 300 for i in range(10)]
    with open(p, "w") as f:
        for i, nm in enumerate(names):
            f.write(f"@{nm} comment\nACGTACGTACGT\n+\n############\n")
    rs = N.ReadsStream(str(p), chunk_reads=4, row_len=32)
    got = []
    for codes, lens, nms in rs:
        got.extend(nms)
        assert (lens == 12).all()
    assert got == names


def test_reads_select(tmp_path):
    p = tmp_path / "reads.fa"
    seqs = ["ACGT" * (i + 1) for i in range(20)]
    with open(p, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">read{i} etc\n{s}\n")
    ids = [0, 7, 19]
    rows, names = N.parse_reads_select(str(p), ids)
    assert names == [f"read{i}" for i in ids]
    for row, i in zip(rows, ids):
        np.testing.assert_array_equal(row, K.seq_to_codes(seqs[i]))
    rows, names = N.parse_reads_select(str(p), [])
    assert rows == [] and names == []
