"""Property tests for ccdBG construction (Python reference builder).

Oracle pattern per SURVEY.md §4: the fast path is validated against naive
per-k-mer recomputation (the reference's --check does the same against
GGCAT's stream, include/builders/builder.hpp:221-277).
"""

import numpy as np
import pytest

from fulgor_tpu.build import ccdbg as C
from fulgor_tpu.core import kmers as K


def random_genomes(rng, num_colors=4, length=400, mut=0.02, k=15):
    """Genomes derived from one ancestor with point mutations -> shared and
    private k-mers, i.e. non-trivial color sets."""
    anc = rng.integers(0, 4, size=length).astype(np.uint8)
    genomes = []
    for _ in range(num_colors):
        g = anc.copy()
        nmut = rng.poisson(mut * length)
        pos = rng.choice(length, size=min(nmut, length), replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=len(pos))) % 4
        genomes.append([K.codes_to_seq(g)])
    return genomes


def naive_kmer_colors(genomes_seqs, k):
    """dict: canonical kmer -> sorted tuple of colors."""
    table = {}
    for color, seqs in enumerate(genomes_seqs):
        for s in seqs:
            km, valid = K.pack_kmers(K.seq_to_codes(s), k)
            for x in np.unique(K.canonicalize(km[valid], k)):
                table.setdefault(int(x), set()).add(color)
    return {x: tuple(sorted(cs)) for x, cs in table.items()}


def unitig_kmer_map(g: C.CCDBG):
    """dict: canonical kmer -> (unitig_id, color set tuple); asserts no dup."""
    out = {}
    for i in range(g.num_unitigs):
        codes = g.unitig_codes[g.unitig_offs[i] : g.unitig_offs[i + 1]]
        km, valid = K.pack_kmers(codes, g.k)
        assert valid.all()
        cs = tuple(int(c) for c in g.color_set(int(g.unitig_cs[i])))
        for x in K.canonicalize(km, g.k):
            assert int(x) not in out, "kmer appears in two unitigs"
            out[int(x)] = (i, cs)
    return out


@pytest.mark.parametrize("k", [11, 15])
def test_ccdbg_matches_naive(rng, k):
    genomes = random_genomes(rng, num_colors=5, length=600, k=k)
    g = C.build_ccdbg_py(genomes, k)
    naive = naive_kmer_colors(genomes, k)
    got = unitig_kmer_map(g)
    assert set(got.keys()) == set(naive.keys())
    for x, cs in naive.items():
        assert got[x][1] == cs, f"kmer {K.kmer_to_str(x, k)}"
    assert g.num_kmers == len(naive)


def test_ccdbg_grouped_and_first_occurrence(rng):
    genomes = random_genomes(rng, num_colors=4, length=500, k=13)
    g = C.build_ccdbg_py(genomes, 13)
    cs = g.unitig_cs.astype(np.int64)
    # grouped: all unitigs of a set adjacent; ids assigned in appearance order
    first = {}
    prev = -1
    for i, s in enumerate(cs):
        if s != prev:
            assert s not in first, "color set id not contiguous"
            first[s] = i
            prev = s
    assert sorted(first.keys()) == list(range(g.num_color_sets))
    assert list(first.keys()) == sorted(first.keys())  # appearance order == id order
    # no duplicate color sets
    seen = set()
    for sid in range(g.num_color_sets):
        key = g.color_set(sid).tobytes()
        assert key not in seen
        seen.add(key)


def test_ccdbg_deterministic(rng):
    genomes = random_genomes(rng, num_colors=3, length=300, k=11)
    g1 = C.build_ccdbg_py(genomes, 11)
    g2 = C.build_ccdbg_py(genomes, 11)
    np.testing.assert_array_equal(g1.unitig_codes, g2.unitig_codes)
    np.testing.assert_array_equal(g1.unitig_cs, g2.unitig_cs)
    np.testing.assert_array_equal(g1.cs_colors, g2.cs_colors)


def test_ccdbg_cycle():
    # circular genome: s + s[:k-1] gives a pure cycle if all kmers distinct
    k = 7
    rng = np.random.default_rng(3)
    while True:
        s = K.codes_to_seq(rng.integers(0, 4, size=50).astype(np.uint8))
        circ = s + s[: k - 1]
        km, valid = K.pack_kmers(K.seq_to_codes(circ), k)
        can = K.canonicalize(km, k)
        if len(np.unique(can)) == len(can):
            break
    g = C.build_ccdbg_py([[circ]], k)
    naive = naive_kmer_colors([[circ]], k)
    got = unitig_kmer_map(g)
    assert set(got.keys()) == set(naive.keys())


def test_ccdbg_multi_record_and_n_bases():
    k = 9
    seqs = ["ACGTACGTACGTACGAAT", "TTTTGGGGCCCCAAAAGGT"]
    noisy = ["ACGTACGTANNNCGTACGAAT"]  # N splits records into valid windows
    g = C.build_ccdbg_py([seqs, noisy], k)
    naive = naive_kmer_colors([seqs, noisy], k)
    got = unitig_kmer_map(g)
    assert set(got.keys()) == set(naive.keys())
    for x, cs in naive.items():
        assert got[x][1] == cs


def test_ccdbg_fuzz_native_vs_python(tmp_path):
    """Seeded fuzz across k, mutation rates, tandem repeats (cycles), Ns,
    multi-record inputs, and multi-pass builds: native == python reference
    == naive per-k-mer oracle. (300-trial extended run: 0 failures.)"""
    import os

    from fulgor_tpu.native import lib as N
    from tests.test_native import write_fasta

    for trial in range(20):
        rng2 = np.random.default_rng(1000 + trial)
        k = int(rng2.choice([5, 9, 15, 31]))
        nc = int(rng2.integers(1, 5))
        length = int(rng2.integers(k + 1, 250))
        anc = rng2.integers(0, 4, size=length).astype(np.uint8)
        genomes = []
        for _ in range(nc):
            g = anc.copy()
            nm = rng2.poisson(0.05 * length)
            if nm:
                pos = rng2.choice(length, size=min(nm, length), replace=False)
                g[pos] = (g[pos] + rng2.integers(1, 4, size=len(pos))) % 4
            s = K.codes_to_seq(g)
            if rng2.random() < 0.3:
                s = s + s[: length // 2]
            if rng2.random() < 0.3:
                i = rng2.integers(0, len(s))
                s = s[:i] + "N" * int(rng2.integers(1, 4)) + s[i:]
            genomes.append([s])
        paths = []
        for i, seqs in enumerate(genomes):
            p = str(tmp_path / f"t{trial}_g{i}.fa")
            write_fasta(p, seqs)
            paths.append(p)
        ref = C.build_ccdbg_py(genomes, k)
        got = N.build_ccdbg(paths, k, num_passes=int(rng2.choice([1, 3])))
        np.testing.assert_array_equal(got["unitig_codes"], ref.unitig_codes, err_msg=f"t{trial}")
        np.testing.assert_array_equal(got["unitig_cs"], ref.unitig_cs, err_msg=f"t{trial}")
        np.testing.assert_array_equal(got["cs_colors"], ref.cs_colors, err_msg=f"t{trial}")
        naive = naive_kmer_colors(genomes, k)
        got_map = unitig_kmer_map(ref)
        assert set(got_map.keys()) == set(naive.keys()), f"t{trial}"


def test_ccdbg_spill_equals_reparse(tmp_path):
    """Disk-spill (single-parse) multi-pass build output is byte-identical
    to the re-parse mode and to a single-pass build."""
    from fulgor_tpu.native import lib as N
    from tests.test_native import write_fasta

    rng = np.random.default_rng(77)
    k = 15
    genomes = random_genomes(rng, num_colors=6, length=700, mut=0.05, k=k)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp_path / f"s{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    base = N.build_ccdbg(paths, k, num_passes=1)
    for passes in (2, 5):
        got = N.build_ccdbg(paths, k, num_passes=passes, spill_dir=str(tmp_path))
        for key in ("unitig_codes", "unitig_offs", "unitig_cs", "cs_colors", "cs_offs"):
            np.testing.assert_array_equal(got[key], base[key], err_msg=f"p{passes}:{key}")
        assert got["num_kmers"] == base["num_kmers"]
    # no temp files left behind
    assert not [f for f in tmp_path.iterdir() if "fulgor_spill" in f.name]
