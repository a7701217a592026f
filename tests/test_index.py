"""Index build / save / load / dump round-trip tests."""

import numpy as np
import pytest

from fulgor_tpu.build.builder import build_index, check_index, unitig_kmers
from fulgor_tpu.core import kmers as K
from fulgor_tpu.index import Index
from fulgor_tpu.query.host_lookup import lookup_host
from tests.test_ccdbg import naive_kmer_colors, random_genomes
from tests.test_native import write_fasta


@pytest.fixture
def small_index(tmp_path, rng):
    k = 15
    genomes = random_genomes(rng, num_colors=6, length=1000, k=k)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp_path / f"g{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    return build_index(paths, k=k, m=9, dict_kind="cuckoo"), genomes, k


def test_build_and_check(small_index):
    idx, genomes, k = small_index
    assert check_index(idx, verbose=False)
    assert idx.num_colors == len(genomes)
    # per-kmer color sets match naive
    naive = naive_kmer_colors(genomes, k)
    keys = np.array(sorted(naive.keys()), dtype=np.uint64)
    csids = lookup_host(idx.dict_table, keys)  # table values ARE csids
    assert (csids != 0xFFFFFFFF).all()
    cat, offs = idx.color_sets_decoded()
    for x, sid in zip(keys[:200], csids[:200]):
        expect = naive[int(x)]
        got = tuple(cat[offs[sid] : offs[sid + 1]])
        assert got == expect
    # negative lookups miss
    miss = rng_missing_keys(naive, k)
    assert (lookup_host(idx.dict_table, miss) == 0xFFFFFFFF).all()


def rng_missing_keys(naive, k, n=1000):
    rng = np.random.default_rng(123)
    cand = K.canonicalize(rng.integers(0, 1 << (2 * k), size=n).astype(np.uint64), k)
    return cand[~np.isin(cand, np.array(list(naive.keys()), dtype=np.uint64))]


def test_save_load_roundtrip(small_index, tmp_path):
    idx, _, _ = small_index
    p = str(tmp_path / "test.tfur")
    idx.save(p)
    idx2 = Index.load(p)
    assert idx2.kind == idx.kind
    assert idx2.k == idx.k and idx2.m == idx.m
    assert idx2.num_kmers == idx.num_kmers
    assert idx2.filenames == idx.filenames
    np.testing.assert_array_equal(idx2.dict_table, idx.dict_table)
    np.testing.assert_array_equal(idx2.unitig_seq, idx.unitig_seq)
    np.testing.assert_array_equal(idx2.unitig_offs, idx.unitig_offs)
    np.testing.assert_array_equal(idx2.u2c_csid, idx.u2c_csid)
    np.testing.assert_array_equal(idx2.color_store.stream, idx.color_store.stream)
    np.testing.assert_array_equal(idx2.color_store.bit_offs, idx.color_store.bit_offs)


def test_dump_from_dump_roundtrip(small_index, tmp_path):
    idx, _, _ = small_index
    base = str(tmp_path / "dumped")
    idx.dump(base)
    idx2 = Index.from_dump(base, m=idx.m)
    assert idx2.num_kmers == idx.num_kmers
    assert idx2.num_colors == idx.num_colors
    np.testing.assert_array_equal(idx2.unitig_offs, idx.unitig_offs)
    np.testing.assert_array_equal(idx2.u2c_csid, idx.u2c_csid)
    np.testing.assert_array_equal(idx2.color_store.bit_offs, idx.color_store.bit_offs)
    np.testing.assert_array_equal(idx2.color_store.stream, idx.color_store.stream)
    # dictionary content equivalent (backend-agnostic: from_dump defaults to
    # the mini backend; the fixture index is cuckoo)
    from fulgor_tpu.build.builder import check_index

    assert check_index(idx2)
    # second dump is byte-identical
    base2 = str(tmp_path / "dumped2")
    idx2.dump(base2)
    for suffix in (".metadata.txt", ".color_sets.txt", ".unitigs.fa"):
        assert open(base + suffix, "rb").read() == open(base2 + suffix, "rb").read()


def test_dense_color_bits(small_index):
    idx, _, _ = small_index
    bits = idx.dense_color_bits()
    assert bits.shape == (idx.num_color_sets, (idx.num_colors + 31) // 32)
    for sid in range(idx.num_color_sets):
        expect = idx.color_set(sid)
        got = np.flatnonzero(
            np.unpackbits(bits[sid].view(np.uint8), bitorder="little")
        )
        np.testing.assert_array_equal(got, expect)
