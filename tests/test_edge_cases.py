"""Edge cases: degenerate reads, empty inputs, tiny references."""

import gzip

import numpy as np
import pytest

from fulgor_tpu import cli
from fulgor_tpu.build.builder import build_index
from fulgor_tpu.core import kmers as K
from fulgor_tpu.index import Index
from fulgor_tpu.query.engine import QueryEngine
from tests.test_native import write_fasta

K_LEN = 15


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("edge")
    rng = np.random.default_rng(3)
    seqs = [K.codes_to_seq(rng.integers(0, 4, size=400).astype(np.uint8)) for _ in range(2)]
    paths = []
    for i, s in enumerate(seqs):
        p = str(tmp / f"g{i}.fa")
        write_fasta(p, [s])
        paths.append(p)
    idx = build_index(paths, k=K_LEN, m=9)
    return tmp, idx, seqs


def test_degenerate_reads(tiny, tmp_path):
    tmp, idx, seqs = tiny
    eng = QueryEngine(idx, batch_size=16)
    reads = [
        "A" * (K_LEN - 1),        # shorter than k
        "",                        # empty  (parser may drop; see below)
        "N" * 40,                  # all invalid
        seqs[0][:40],              # mapped
        "ACGT",                    # shorter than k
        seqs[1][10:80],            # mapped
    ]
    qfile = str(tmp_path / "r.fq")
    with open(qfile, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@e{i}\n{r}\n+\n{'I' * len(r)}\n")
    out = str(tmp_path / "o.tsv")
    eng.pseudoalign_file(qfile, out)
    lines = open(out).read().splitlines()
    assert len(lines) == len(reads)
    got = {int(l.split("\t")[0]): l.split("\t")[1:] for l in lines}
    assert got[0][0] == "0" and got[2][0] == "0" and got[4][0] == "0"
    assert int(got[3][0]) >= 1 and int(got[5][0]) >= 1
    # threshold mode on the same degenerate input
    out2 = str(tmp_path / "o2.tsv")
    eng.pseudoalign_file(qfile, out2, threshold=0.8)
    assert len(open(out2).read().splitlines()) == len(reads)
    # conservation + matches don't crash on degenerate reads
    eng.kmer_conservation_file(qfile, str(tmp_path / "kc.tsv"))
    eng.kmer_matches_file(qfile, str(tmp_path / "km.tsv"))
    assert len(open(tmp_path / "kc.tsv").read().splitlines()) == len(reads)


def test_empty_query_file(tiny, tmp_path):
    tmp, idx, seqs = tiny
    qfile = str(tmp_path / "empty.fq")
    open(qfile, "w").close()
    out = str(tmp_path / "o.tsv")
    stats = QueryEngine(idx, batch_size=16).pseudoalign_file(qfile, out)
    assert stats["num_reads"] == 0
    assert open(out).read() == ""


def test_single_genome_single_color(tmp_path):
    rng = np.random.default_rng(5)
    s = K.codes_to_seq(rng.integers(0, 4, size=300).astype(np.uint8))
    p = str(tmp_path / "g.fa")
    write_fasta(p, [s])
    idx = build_index([p], k=K_LEN, m=9)
    assert idx.num_colors == 1
    assert idx.num_color_sets == 1
    eng = QueryEngine(idx, batch_size=8)
    res = eng.pseudoalign_codes(
        K.seq_to_codes(s[:50])[None, :].astype(np.uint8), np.array([50], np.int32)
    )
    np.testing.assert_array_equal(res[0], [0])


def test_long_read_straggler(tiny, tmp_path):
    """Reads wider than the stream ladder take the exact host path and are
    appended after in-order output."""
    tmp, idx, seqs = tiny
    long_read = (seqs[0] * 4)[:1500]  # > MAX_STREAM_WIDTH
    qfile = str(tmp_path / "r.fa")
    with open(qfile, "w") as f:
        f.write(f">short\n{seqs[0][:60]}\n>long\n{long_read}\n>short2\n{seqs[1][:60]}\n")
    out = str(tmp_path / "o.tsv")
    eng = QueryEngine(idx, batch_size=8)
    eng.pseudoalign_file(qfile, out)
    lines = open(out).read().splitlines()
    assert len(lines) == 3
    got = {int(l.split("\t")[0]): l for l in lines}
    expect_long = eng._host_full_intersection(K.seq_to_codes(long_read))
    parts = got[1].split("\t")
    np.testing.assert_array_equal(np.array(parts[2:], dtype=np.uint32), expect_long)
