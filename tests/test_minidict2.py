"""minidict2 (bucketless robin-hood dictionary): host exactness vs the
cuckoo oracle, device kernel vs host device-semantics, overflow contract."""

import numpy as np
import pytest

from fulgor_tpu.build.builder import build_index
from fulgor_tpu.core import kmers as K
from fulgor_tpu.ops import minidict2 as M2
from fulgor_tpu.query.host_lookup import lookup_host
from tests.test_ccdbg import random_genomes
from tests.test_native import write_fasta

K_LEN, M_LEN = 15, 9


# k=31 exercises the hi-word compare path (2k > 32: fhi/rhi, hi_mask) that
# production uses — k=15 alone leaves it dark (round-2 ADVICE).
@pytest.fixture(scope="module", params=[(15, 9), (31, 19)],
                ids=["k15", "k31"])
def built(request, tmp_path_factory):
    k_len, m_len = request.param
    rng = np.random.default_rng(17)
    tmp = tmp_path_factory.mktemp(f"md2_k{k_len}")
    genomes = random_genomes(rng, num_colors=6, length=3000, mut=0.02, k=k_len)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp / f"g{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    idx = build_index(paths, k=k_len, m=m_len, dict_kind="cuckoo")
    ucodes = K.unpack2(idx.unitig_seq, int(idx.unitig_offs[-1]))
    d = M2.build_minidict2(ucodes, idx.unitig_offs, idx.u2c_csid, k_len, m_len)
    return idx, d, genomes, rng, paths, k_len, m_len


def _reads(rng, genomes, n, L):
    reads = []
    for _ in range(n):
        g = genomes[rng.integers(0, len(genomes))][0]
        p = rng.integers(0, len(g) - L)
        r = K.seq_to_codes(g[p : p + L]).copy()
        ne = rng.integers(0, 3)
        if ne:
            pos = rng.choice(L, size=ne, replace=False)
            r[pos] = (r[pos] + rng.integers(1, 4, size=ne)) % 4
        reads.append(r)
    reads.append(rng.integers(0, 4, size=L).astype(np.uint8))  # junk
    reads.append(np.full(L, 4, dtype=np.uint8))  # all-N
    return reads


def test_host_exact_vs_cuckoo(built):
    idx, d, genomes, rng, _paths, k_len, m_len = built
    for row in _reads(rng, genomes, 60, 60):
        hit, cs = M2.lookup_host_exact(d, row)
        km, valid = K.pack_kmers(row, k_len)
        gt = lookup_host(idx.dict_table, K.canonicalize(km, k_len))
        gt_hit = valid & (gt != 0xFFFFFFFF)
        np.testing.assert_array_equal(hit, gt_hit)
        np.testing.assert_array_equal(cs[gt_hit], gt[gt_hit])


def test_device_matches_host_sem(built):
    import jax.numpy as jnp

    idx, d, genomes, rng, _paths, k_len, m_len = built
    L = 60
    reads = _reads(rng, genomes, 40, L)
    batch = np.stack(reads)
    hit, cs, ovf = M2.lookup_minidict2_batch(
        jnp.asarray(d.slots), jnp.asarray(d.text32), jnp.asarray(d.sec_table),
        jnp.asarray(batch.astype(np.int32)), k=k_len, m=m_len,
        num_slots=d.num_slots,
    )
    hit, cs, ovf = np.asarray(hit), np.asarray(cs), np.asarray(ovf)
    for i, row in enumerate(reads):
        hh, cc, oo = M2.lookup_host_device_sem(d, row)
        np.testing.assert_array_equal(hit[i], hh, err_msg=f"read {i} hit")
        np.testing.assert_array_equal(cs[i], cc, err_msg=f"read {i} csid")
        np.testing.assert_array_equal(ovf[i], oo, err_msg=f"read {i} ovf")


def test_overflow_contract(built):
    """Every non-ovf window must agree with the exact probe; ovf windows
    must be resolvable by it (the engine's fallback path)."""
    idx, d, genomes, rng, _paths, k_len, m_len = built
    for row in _reads(rng, genomes, 30, 80):
        he, ce = M2.lookup_host_exact(d, row)
        hd, cd, ovf = M2.lookup_host_device_sem(d, row)
        np.testing.assert_array_equal(hd[~ovf], he[~ovf])
        np.testing.assert_array_equal(cd[hd], ce[hd])
        assert not (ovf & hd).any()


def test_probe_windows_host_matches_exact(built):
    """The vectorized bulk host probe == the per-read exact probe."""
    idx, d, genomes, rng, _paths, k_len, m_len = built
    for row in _reads(rng, genomes, 40, 80):
        he, ce = M2.lookup_host_exact(d, row)
        hv, cv = M2.probe_windows_host(d, row)
        np.testing.assert_array_equal(he, hv)
        np.testing.assert_array_equal(ce[he], cv[he])


def test_anchored_probe_contract(built):
    """Run-anchored (v2, compacted-lane) device probe soundness: every
    non-ovf window must agree EXACTLY with the exact host probe (both hit
    and csid — extension hits are text-verified, anchor/reprobe misses are
    definitive), every hit must be correct even when flagged is impossible
    (hit & ovf = empty), and ovf windows must be resolvable by the exact
    probe (the engine's redo path). Run on several lane budgets so the
    RA/RU overflow paths are exercised, not just the happy path."""
    import jax.numpy as jnp

    idx, d, genomes, rng, _paths, k_len, m_len = built
    L = 73
    reads = _reads(rng, genomes, 50, L)
    batch = np.stack(reads)
    args = (
        jnp.asarray(d.slots), jnp.asarray(d.text32), jnp.asarray(d.sec_table),
        jnp.asarray(batch.astype(np.int32)),
    )
    kw = dict(k=k_len, m=m_len, num_slots=d.num_slots)
    hit, cs, ovf = map(np.asarray, M2.lookup_minidict2_batch(*args, **kw))
    exact = [M2.lookup_host_exact(d, row) for row in reads]
    for RA, RU in ((None, None), (4, 2), (2, 1)):
        hitA, csA, ovfA = map(
            np.asarray,
            M2.lookup_minidict2_batch_anchored(*args, **kw, RA=RA, RU=RU),
        )
        assert not (hitA & ovfA).any()
        both = hit & hitA
        np.testing.assert_array_equal(csA[both], cs[both])
        for i, (he, ce) in enumerate(exact):
            ok = ~ovfA[i]
            np.testing.assert_array_equal(
                hitA[i][ok], he[ok], err_msg=f"RA={RA} read {i} hit")
            h = hitA[i] & ok
            np.testing.assert_array_equal(
                csA[i][h], ce[h], err_msg=f"RA={RA} read {i} csid")
        if RA is None:
            # default budgets: loose cap over the error-dense read mix
            # (reads with ~2 errors/73bp legitimately go to the redo path)
            assert ovfA.mean() <= 0.25, (
                f"anchored default-budget ovf rate {ovfA.mean():.4f}")

    # error-FREE reads drawn straight from the corpus must almost never
    # overflow the default budgets (this is the bench/primary regime)
    clean = []
    for _ in range(64):
        g = genomes[rng.integers(0, len(genomes))][0]
        p = rng.integers(0, len(g) - L)
        clean.append(K.seq_to_codes(g[p : p + L]))
    cbatch = jnp.asarray(np.stack(clean).astype(np.int32))
    args_c = args[:3] + (cbatch,)
    hitC, csC, ovfC = map(
        np.asarray, M2.lookup_minidict2_batch_anchored(*args_c, **kw))
    assert ovfC.mean() <= 0.01, (
        f"clean-read anchored ovf rate {ovfC.mean():.4f}")
    for i, row in enumerate(clean):
        he, ce = M2.lookup_host_exact(d, row)
        ok = ~ovfC[i]
        np.testing.assert_array_equal(hitC[i][ok], he[ok])
        h = hitC[i] & ok
        np.testing.assert_array_equal(csC[i][h], ce[h])


def test_staged_probe_contract(built):
    """Staged-verify probe soundness (the (vb1, vb2, sc, RU) 4-tuple
    budget): every non-ovf window agrees EXACTLY with the one-pass probe
    at (vb2, sc) — same hit, same csid — hits are never flagged ovf, and
    every ovf window is resolvable by the exact host probe. Tiny RU / B
    force the heavy-read tier (B2) and its sub-batch overflow path."""
    import jax.numpy as jnp

    from fulgor_tpu.ops.lookup import pack_reads_host

    idx, d, genomes, rng, _paths, k_len, m_len = built
    L = 64
    reads = _reads(rng, genomes, 46, L)
    batch = np.stack(reads).astype(np.uint8)
    codes2, bad = pack_reads_host(batch)
    args = (
        jnp.asarray(d.slots), jnp.asarray(d.text32), jnp.asarray(d.sec_table),
        jnp.asarray(codes2), jnp.asarray(bad),
    )
    kw = dict(width=L, k=k_len, m=m_len, num_slots=d.num_slots)
    # one-pass reference at the staged second-stage budgets
    hit1, cs1, ovf1 = map(
        np.asarray,
        M2.lookup_minidict2_packed(*args, **kw, probe_budget=(8, 4)),
    )
    exact = [M2.lookup_host_exact(d, row) for row in reads]
    for vb1, ru in ((2, 16), (2, 2), (1, 1)):
        hitS, csS, ovfS = map(
            np.asarray,
            M2.lookup_minidict2_staged_packed(*args, **kw, vb1=vb1, vb2=8,
                                              sc=4, RU=ru),
        )
        assert not (hitS & ovfS).any(), f"RU={ru}: hit & ovf overlap"
        ok = ~ovfS
        np.testing.assert_array_equal(hitS[ok & ~ovf1], hit1[ok & ~ovf1],
                                      err_msg=f"RU={ru} hit")
        both = hitS & hit1
        np.testing.assert_array_equal(csS[both], cs1[both],
                                      err_msg=f"RU={ru} csid")
        for i, (he, ce) in enumerate(exact):
            okw = ok[i]
            np.testing.assert_array_equal(hitS[i][okw], he[okw],
                                          err_msg=f"RU={ru} read {i} hit")
            h = hitS[i] & okw
            np.testing.assert_array_equal(csS[i][h], ce[h],
                                          err_msg=f"RU={ru} read {i} csid")
        if ru == 16:
            # this fixture's random mini-corpus is skew-HEAVY (many reads
            # exceed RU undecided windows, and the B2 sub-batch is only
            # B//8 = 6 rows at B=48), so a loose cap is the right check —
            # the engine picks staged only on skew-LIGHT dictionaries,
            # where the bench measures the real ovf rate
            assert ovfS.mean() <= 0.35, (
                f"staged default-budget ovf rate {ovfS.mean():.4f}")


def test_mini_index_end_to_end(built, tmp_path):
    """mini-backend Index: build, check, save/load roundtrip, and engine
    results equal to the cuckoo backend on the same reads."""
    from fulgor_tpu.build.builder import build_index as BI, check_index
    from fulgor_tpu.query.engine import QueryEngine

    idx_c, d, genomes, rng, paths, k_len, m_len = built
    idx_m = BI(paths, k=k_len, m=m_len, dict_kind="mini")
    assert idx_m.dict_kind == "mini" and idx_m.dict_table is None
    assert idx_m.num_kmers == idx_c.num_kmers
    assert check_index(idx_m)

    path = str(tmp_path / "mini.tfur")
    idx_m.save(path)
    from fulgor_tpu.index import Index

    idx_r = Index.load(path)
    assert idx_r.dict_kind == "mini"
    np.testing.assert_array_equal(idx_r.mini_slots, idx_m.mini_slots)
    np.testing.assert_array_equal(idx_r.mini_sec, idx_m.mini_sec)
    assert idx_r.mini_num_slots == idx_m.mini_num_slots

    reads = _reads(rng, genomes, 50, 60)
    codes = np.stack(reads)
    lens = np.full(len(reads), 60, dtype=np.int64)
    res_c = QueryEngine(idx_c, batch_size=32, use_mesh=False).pseudoalign_codes(codes, lens)
    res_m = QueryEngine(idx_r, batch_size=32, use_mesh=False).pseudoalign_codes(codes, lens)
    for a, b in zip(res_c, res_m):
        np.testing.assert_array_equal(a, b)
    # threshold-union too
    res_ct = QueryEngine(idx_c, batch_size=32, use_mesh=False).pseudoalign_codes(
        codes, lens, threshold=0.8)
    res_mt = QueryEngine(idx_r, batch_size=32, use_mesh=False).pseudoalign_codes(
        codes, lens, threshold=0.8)
    for a, b in zip(res_ct, res_mt):
        np.testing.assert_array_equal(a, b)
