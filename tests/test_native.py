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


def test_symdiff_segments_fuzz():
    """fn_symdiff_segments == np.setxor1d per segment (incl. empty segs)."""
    rng = np.random.default_rng(0)
    for trial in range(50):
        n = int(rng.integers(0, 30))
        A, B, oa, ob = [], [], [0], [0]
        for _ in range(n):
            a = np.unique(rng.integers(0, 50, rng.integers(0, 12)))
            b = np.unique(rng.integers(0, 50, rng.integers(0, 12)))
            A.append(a)
            B.append(b)
            oa.append(oa[-1] + len(a))
            ob.append(ob[-1] + len(b))
        ca = np.concatenate(A).astype(np.uint32) if n else np.empty(0, np.uint32)
        cb = np.concatenate(B).astype(np.uint32) if n else np.empty(0, np.uint32)
        oc, oo = N.symdiff_segments(
            ca, np.array(oa, np.int64), cb, np.array(ob, np.int64)
        )
        for s in range(n):
            want = np.setxor1d(A[s], B[s]).astype(np.uint32)
            np.testing.assert_array_equal(want, oc[oo[s] : oo[s + 1]])


def test_symdiff_segments_ind_fuzz():
    """fn_symdiff_segments_ind == np.setxor1d over arbitrary [start, end)
    slices of a shared buffer (the chain-diff parent-in-place path)."""
    rng = np.random.default_rng(3)
    for trial in range(50):
        n = int(rng.integers(0, 30))
        # one shared buffer of sorted runs; segments pick arbitrary slices
        runs = []
        bounds = [0]
        for _ in range(max(1, 2 * n)):
            r = np.unique(rng.integers(0, 50, rng.integers(0, 12)))
            runs.append(r)
            bounds.append(bounds[-1] + len(r))
        buf = (
            np.concatenate(runs).astype(np.uint32)
            if runs
            else np.empty(0, np.uint32)
        )
        pick = lambda: int(rng.integers(0, len(runs)))
        ia = [pick() for _ in range(n)]
        ib = [pick() for _ in range(n)]
        sa = np.array([bounds[i] for i in ia], np.int64)
        ea = np.array([bounds[i + 1] for i in ia], np.int64)
        sb = np.array([bounds[i] for i in ib], np.int64)
        eb = np.array([bounds[i + 1] for i in ib], np.int64)
        oc, oo = N.symdiff_segments_ind(buf, sa, ea, buf, sb, eb)
        for s in range(n):
            want = np.setxor1d(runs[ia[s]], runs[ib[s]]).astype(np.uint32)
            np.testing.assert_array_equal(want, oc[oo[s] : oo[s + 1]])


def test_dense_bits_fuzz():
    """fn_dense_bits == per-set bit raster, full and arbitrary-subset rows."""
    rng = np.random.default_rng(2)
    for _ in range(30):
        S, C = int(rng.integers(0, 40)), int(rng.integers(1, 100))
        sizes = rng.integers(0, C, S)
        offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        cat = rng.integers(0, C, int(offs[-1])).astype(np.uint32)
        got = N.dense_bits(cat, offs[:-1], offs[1:], C)
        W = (C + 31) // 32
        want = np.zeros((S, W), np.uint32)
        for s in range(S):
            for c in cat[offs[s] : offs[s + 1]]:
                want[s, c >> 5] |= np.uint32(1) << np.uint32(c & 31)
        np.testing.assert_array_equal(got, want)
        if S:
            sel = rng.integers(0, S, max(1, S // 2))
            got2 = N.dense_bits(cat, offs[sel], offs[sel + 1], C)
            np.testing.assert_array_equal(got2, want[sel])


def test_pooled_features_matches_bincount():
    rng = np.random.default_rng(1)
    n, C, D = 200, 37, 8
    sizes = rng.integers(0, C, n)
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    cat = rng.integers(0, C, int(offs[-1])).astype(np.uint32)
    got = N.pooled_features(cat, offs, C, D)
    want = np.zeros((n, D), np.uint32)
    for s in range(n):
        for c in cat[offs[s] : offs[s + 1]]:
            want[s, int(c) * D // C] += 1
    np.testing.assert_array_equal(got, want)


def test_bisect2_properties():
    """Deterministic, valid 2-way split with exact child SSEs."""
    rng = np.random.default_rng(2)
    X = np.ascontiguousarray(
        np.concatenate([rng.normal(0, 1, (300, 16)), rng.normal(8, 1, (200, 16))]),
        dtype=np.float32,
    )
    idx = np.arange(len(X), dtype=np.int64)
    a1, s0, s1 = N.bisect2(X, idx, 5, 10)
    a2, t0, t1 = N.bisect2(X, idx, 5, 10)
    np.testing.assert_array_equal(a1, a2)
    assert (s0, s1) == (t0, t1)
    # the two planted clusters must be separated
    assert len(set(a1[:300])) == 1 and len(set(a1[300:])) == 1
    assert a1[0] != a1[-1]
    for side in (0, 1):
        sub = X[idx[a1 == side]].astype(np.float64)
        want = ((sub - sub.mean(axis=0)) ** 2).sum()
        got = s0 if side == 0 else s1
        assert abs(got - want) < 1e-6 * max(1.0, want)


def test_pack_patterns_roundtrip():
    from fulgor_tpu.core.bitsx import BitReader, BitWriter

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 40, 1000).astype(np.uint64)
    w = BitWriter()
    w.append_deltas(vals)
    words = w.finalize()
    r = BitReader(words, 0)
    got = np.array([r.read_delta() for _ in range(len(vals))], dtype=np.uint64)
    np.testing.assert_array_equal(got, vals)


def test_format_psa_grouped_equals_plain():
    rng = np.random.default_rng(4)
    G, c32, n = 7, 3, 500
    rows = rng.integers(0, 1 << 32, (G, c32), dtype=np.uint64).astype(np.uint32)
    rows[0] = 0  # an unmapped body
    inv = rng.integers(0, G, n).astype(np.int32)
    qids = rng.permutation(n).astype(np.uint32)
    a, ma = N.format_psa_ascii_bits_grouped(qids, rows, inv)
    b, mb = N.format_psa_ascii_bits(qids, rows[inv])
    assert a == b and ma == mb
