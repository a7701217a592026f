"""Unit tests for host-side core: k-mer packing, bit codecs, hybrid codec."""

import numpy as np
import pytest

from fulgor_tpu.core import kmers as K
from fulgor_tpu.core.bitsx import BitReader, BitWriter, EliasFano
from fulgor_tpu.core import hybrid as H


# ---------------- kmers ----------------


def test_pack_roundtrip():
    s = "ACGTACGTTTGCA"
    codes = K.seq_to_codes(s)
    km, valid = K.pack_kmers(codes, 5)
    assert valid.all()
    assert len(km) == len(s) - 4
    for p in range(len(km)):
        assert K.kmer_to_str(int(km[p]), 5) == s[p : p + 5]


def test_pack_invalid_bases():
    codes = K.seq_to_codes("ACGTNACGTT")
    km, valid = K.pack_kmers(codes, 4)
    # windows touching position 4 (N) are invalid
    expect = np.array([True, False, False, False, False, True, True])
    np.testing.assert_array_equal(valid, expect)


def test_revcomp(rng):
    for k in (3, 15, 16, 17, 31):
        seqs = rng.integers(0, 4, size=(50, k)).astype(np.uint8)
        for codes in seqs:
            km, _ = K.pack_kmers(codes, k)
            rc = K.revcomp_packed(km, k)
            rc_codes = K.revcomp_codes(codes)
            km2, _ = K.pack_kmers(rc_codes, k)
            assert int(rc[0]) == int(km2[0])
        # canonical is orientation-invariant
        codes = seqs[0]
        km, _ = K.pack_kmers(codes, k)
        km_rc, _ = K.pack_kmers(K.revcomp_codes(codes), k)
        assert int(K.canonicalize(km, k)[0]) == int(K.canonicalize(km_rc, k)[0])


def test_lexicographic_order():
    a = K.str_to_kmer("AAACT")
    b = K.str_to_kmer("AAAGA")
    assert a < b  # numeric order == lexicographic order


# ---------------- bitsx ----------------


def test_delta_roundtrip(rng):
    xs = np.concatenate(
        [
            np.arange(70, dtype=np.uint64),
            rng.integers(0, 1 << 32, size=1000).astype(np.uint64),
        ]
    )
    w = BitWriter()
    w.append_deltas(xs)
    words = w.finalize()
    r = BitReader(words)
    got = [r.read_delta() for _ in xs]
    np.testing.assert_array_equal(np.array(got, dtype=np.uint64), xs)


def test_mixed_stream(rng):
    w = BitWriter()
    w.append_deltas(np.array([5, 0, 123456], dtype=np.uint64))
    bits = rng.integers(0, 2, size=131).astype(bool)
    w.append_bits(bits)
    w.append_fixed(np.array([7, 1, 2], dtype=np.uint64), 3)
    w.append_deltas(np.array([42], dtype=np.uint64))
    words = w.finalize()
    r = BitReader(words)
    assert [r.read_delta() for _ in range(3)] == [5, 0, 123456]
    np.testing.assert_array_equal(r.read_bitmap(131), bits)
    assert [r.read_bits(3) for _ in range(3)] == [7, 1, 2]
    assert r.read_delta() == 42
    assert r.pos == w.num_bits


def test_elias_fano(rng):
    vals = np.sort(rng.integers(0, 1 << 40, size=5000).astype(np.uint64))
    ef = EliasFano.encode(vals)
    np.testing.assert_array_equal(ef.decode_all(), vals)
    # empty and singleton
    np.testing.assert_array_equal(
        EliasFano.encode(np.array([7], dtype=np.uint64)).decode_all(),
        np.array([7], dtype=np.uint64),
    )


# ---------------- hybrid codec ----------------


def random_sets(rng, n_sets, num_colors):
    sizes = []
    sets = []
    for _ in range(n_sets):
        mode = rng.integers(0, 3)
        if mode == 0:
            s = rng.integers(1, max(2, num_colors // 4))
        elif mode == 1:
            s = rng.integers(max(1, num_colors // 4), max(2, 3 * num_colors // 4))
        else:
            s = rng.integers(max(1, 3 * num_colors // 4), num_colors + 1)
        s = int(min(max(1, s), num_colors))
        sets.append(np.sort(rng.choice(num_colors, size=s, replace=False)).astype(np.uint32))
        sizes.append(s)
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    return np.concatenate(sets).astype(np.uint32), offs, sets


@pytest.mark.parametrize("num_colors", [3, 10, 100, 1000])
def test_hybrid_roundtrip(rng, num_colors):
    cat, offs, sets = random_sets(rng, 200, num_colors)
    words, bit_offs = H.encode_color_sets(cat, offs, num_colors)
    assert len(bit_offs) == len(sets) + 1
    for i, expect in enumerate(sets):
        got = H.decode_set(words, bit_offs[i], num_colors)
        np.testing.assert_array_equal(got, expect, err_msg=f"set {i}")
        assert H.decode_set_size(words, bit_offs[i]) == len(expect)


def test_hybrid_decode_all(rng):
    num_colors = 64
    cat, offs, sets = random_sets(rng, 100, num_colors)
    words, bit_offs = H.encode_color_sets(cat, offs, num_colors)
    got_cat, got_offs = H.decode_all(words, bit_offs, num_colors)
    np.testing.assert_array_equal(got_offs, offs)
    np.testing.assert_array_equal(got_cat, cat)


def test_hybrid_chunked_equals_single(rng):
    num_colors = 50
    cat, offs, _ = random_sets(rng, 300, num_colors)
    w1, o1 = H.encode_color_sets(cat, offs, num_colors)
    enc = H.HybridEncoder(num_colors, chunk_sets=7)
    enc.add_sets(cat, offs)
    w2, o2 = enc.finalize()
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(w1, w2)
