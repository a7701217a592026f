"""Minimizer-positional dictionary vs the quotient-cuckoo oracle."""

import numpy as np
import pytest

from fulgor_tpu.build.builder import build_index
from fulgor_tpu.core import kmers as K
from fulgor_tpu.ops import minidict as MD
from fulgor_tpu.query.host_lookup import lookup_host
from tests.test_ccdbg import random_genomes
from tests.test_native import write_fasta

K_LEN, M_LEN = 21, 11


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(31)
    tmp = tmp_path_factory.mktemp("md")
    genomes = random_genomes(rng, num_colors=6, length=3000, mut=0.02, k=K_LEN)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp / f"g{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    idx = build_index(paths, k=K_LEN, m=M_LEN, dict_kind="cuckoo")
    codes_all = K.unpack2(idx.unitig_seq, int(idx.unitig_offs[-1]))
    md = MD.build_minidict(codes_all, idx.unitig_offs, idx.u2c_csid, K_LEN, M_LEN)
    return idx, md, genomes, rng


def cuckoo_window_lookup(idx, codes, k):
    km, valid = K.pack_kmers(codes, k)
    out = np.full(len(km), 0xFFFFFFFF, dtype=np.uint32)
    if len(km) == 0:
        return out
    vals = lookup_host(idx.dict_table, K.canonicalize(km, k))
    hitm = valid & (vals != 0xFFFFFFFF)
    out[hitm] = vals[hitm]
    return out


def test_minidict_matches_cuckoo_on_reads(setup):
    idx, md, genomes, rng = setup
    L = 80
    n_ovf = 0
    for t in range(120):
        if t < 90:
            g = genomes[rng.integers(0, len(genomes))][0]
            p = rng.integers(0, len(g) - L)
            r = list(g[p : p + L])
            for _ in range(rng.poisson(2)):
                r[rng.integers(0, L)] = "ACGTN"[rng.integers(0, 5)]
            read = "".join(r)
        else:
            read = K.codes_to_seq(rng.integers(0, 4, size=L).astype(np.uint8))
        codes = K.seq_to_codes(read)
        expect = cuckoo_window_lookup(idx, codes, K_LEN)
        hit, got, ovf = MD.lookup_minidict_host(md, codes)
        n_ovf += int(ovf.sum())
        chk = ~ovf
        np.testing.assert_array_equal(
            hit[chk], (expect != 0xFFFFFFFF)[chk], err_msg=f"read {t} hits"
        )
        np.testing.assert_array_equal(got[chk & hit], expect[chk & hit],
                                      err_msg=f"read {t} csids")
    # overflow should be rare on random-ish data
    assert n_ovf < 120 * (L - K_LEN + 1) * 0.05


def test_minidict_covers_all_unitig_kmers(setup):
    """Every k-mer of every unitig must be found with its csid (the
    --check oracle for this backend)."""
    idx, md, genomes, rng = setup
    codes_all = K.unpack2(idx.unitig_seq, int(idx.unitig_offs[-1]))
    checked = 0
    for u in range(0, idx.num_unitigs, max(1, idx.num_unitigs // 60)):
        seg = codes_all[idx.unitig_offs[u] : idx.unitig_offs[u + 1]]
        hit, got, ovf = MD.lookup_minidict_host(md, seg)
        ok = ~ovf
        assert hit[ok].all(), f"unitig {u}: missed kmers"
        assert (got[ok] == idx.u2c_csid[u]).all(), f"unitig {u}: wrong csid"
        checked += int(ok.sum())
    assert checked > 100


def test_minidict_size(setup):
    idx, md, genomes, rng = setup
    # entries ~ num_kmers / mean-run-length; all-in well under cuckoo size
    assert md.num_bytes() < idx.dict_table.nbytes
    bytes_per_kmer = md.num_bytes() / idx.num_kmers
    assert bytes_per_kmer < 8.0, bytes_per_kmer


def test_device_matches_host(setup):
    """The JAX kernel must reproduce the host lookup bit for bit
    (including overflow flags) on mixed mapped/noisy/junk reads."""
    import jax.numpy as jnp

    from fulgor_tpu.ops.minidict import MAX_CANDIDATES, lookup_minidict_batch

    idx, md, genomes, rng = setup
    L = 90
    B = 40
    codes = np.full((B, L), 4, dtype=np.uint8)
    for i in range(B):
        if i % 5 == 4:
            codes[i] = rng.integers(0, 4, size=L).astype(np.uint8)
            continue
        g = genomes[rng.integers(0, len(genomes))][0]
        p = rng.integers(0, len(g) - L)
        r = K.seq_to_codes(g[p : p + L]).copy()
        for _ in range(rng.poisson(2)):
            r[rng.integers(0, L)] = rng.integers(0, 5)
        codes[i] = r
    hit_d, csid_d, ovf_d = map(
        np.asarray,
        lookup_minidict_batch(
            jnp.asarray(md.entries),
            jnp.asarray(md.bucket_offs),
            jnp.asarray(md.text16),
            jnp.asarray(codes),
            k=K_LEN,
            m=M_LEN,
            max_candidates=MAX_CANDIDATES,
        ),
    )
    for i in range(B):
        hit_h, csid_h, ovf_h = MD.lookup_minidict_host(md, codes[i])
        np.testing.assert_array_equal(ovf_d[i], ovf_h, err_msg=f"row {i} ovf")
        np.testing.assert_array_equal(hit_d[i], hit_h, err_msg=f"row {i} hit")
        np.testing.assert_array_equal(
            csid_d[i][hit_d[i]], csid_h[hit_h], err_msg=f"row {i} csid"
        )
