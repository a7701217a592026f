"""meta / diff / meta-diff conversion tests: build, check, query parity."""

import numpy as np
import pytest

from fulgor_tpu import cli
from fulgor_tpu.core import kmers as K
from fulgor_tpu.index import Index
from tests.test_ccdbg import random_genomes
from tests.test_native import write_fasta

K_LEN = 15


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    rng = np.random.default_rng(21)
    tmp = tmp_path_factory.mktemp("tiers")
    genomes = random_genomes(rng, num_colors=12, length=1200, mut=0.02, k=K_LEN)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp / f"g{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    listfile = str(tmp / "list.txt")
    with open(listfile, "w") as f:
        f.write("\n".join(paths) + "\n")
    out_base = str(tmp / "idx")
    assert cli.main(["build", "-l", listfile, "-o", out_base, "-k", str(K_LEN), "-m", "9"]) == 0
    reads = []
    for _ in range(50):
        g = rng.integers(0, len(genomes))
        s = genomes[g][0]
        p = rng.integers(0, len(s) - 60)
        reads.append(s[p : p + 60])
    qfile = str(tmp / "reads.fa")
    with open(qfile, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    return tmp, out_base, qfile, reads


@pytest.mark.parametrize("flags,ext", [(["--meta"], ".tmfur"), (["--diff"], ".tdfur"),
                                       (["--meta", "--diff"], ".tmdfur")])
def test_color_conversion(base, flags, ext, tmp_path):
    tmp, out_base, qfile, reads = base
    rc = cli.main(["color", "-i", out_base + ".tfur", "--check"] + flags)
    assert rc == 0
    conv_path = out_base + ext
    idx = Index.load(conv_path)
    base_idx = Index.load(out_base + ".tfur")
    assert idx.num_color_sets == base_idx.num_color_sets
    assert cli.main(["check", "-i", conv_path, "--against", out_base + ".tfur"]) == 0

    # pseudoalign outputs agree modulo the color permutation
    out_a = str(tmp_path / "a.tsv")
    out_b = str(tmp_path / "b.tsv")
    assert cli.main(["pseudoalign", "-i", out_base + ".tfur", "-q", qfile, "-o", out_a]) == 0
    assert cli.main(["pseudoalign", "-i", conv_path, "-q", qfile, "-o", out_b]) == 0
    pos = {fn: i for i, fn in enumerate(idx.filenames)}
    perm = np.array([pos[fn] for fn in base_idx.filenames], dtype=np.int64)
    la = open(out_a).read().splitlines()
    lb = open(out_b).read().splitlines()
    assert len(la) == len(lb)
    for ln_a, ln_b in zip(la, lb):
        pa = ln_a.split("\t")
        pb = ln_b.split("\t")
        assert pa[:2] == pb[:2]
        ca = np.sort(perm[np.array(pa[2:], dtype=np.int64)]) if len(pa) > 2 else []
        cb = np.array(pb[2:], dtype=np.int64) if len(pb) > 2 else []
        np.testing.assert_array_equal(ca, cb)


def test_permute_cli(base, tmp_path):
    tmp, out_base, qfile, reads = base
    out = str(tmp_path / "perm.txt")
    assert cli.main(["permute", "-i", out_base + ".tfur", "-o", out]) == 0
    base_idx = Index.load(out_base + ".tfur")
    perm_files = [ln for ln in open(out).read().splitlines() if ln]
    assert sorted(perm_files) == sorted(base_idx.filenames)


def test_tier_save_load_roundtrip(base):
    tmp, out_base, qfile, reads = base
    for ext in (".tmfur", ".tdfur", ".tmdfur"):
        idx = Index.load(out_base + ext)
        cat, offs = idx.color_sets_decoded()
        idx2 = Index.load(out_base + ext)
        cat2, offs2 = idx2.color_sets_decoded()
        np.testing.assert_array_equal(cat, cat2)
        np.testing.assert_array_equal(offs, offs2)


def tree_genomes(rng, depth=7, length=12000, mut_per_branch=40):
    """Binary-tree evolution -> 2^depth leaf genomes with clade structure
    (the regime the meta/diff tiers are built for)."""
    from fulgor_tpu.core import kmers as K

    anc = rng.integers(0, 4, size=length).astype(np.uint8)
    level = [anc]
    for _ in range(depth):
        nxt = []
        for g in level:
            for _ in range(2):
                c = g.copy()
                pos = rng.choice(length, size=mut_per_branch, replace=False)
                c[pos] = (c[pos] + rng.integers(1, 4, size=mut_per_branch)) % 4
                nxt.append(c)
        level = nxt
    return [[K.codes_to_seq(g)] for g in level]


def test_tiers_compress_structured_pangenome(tmp_path):
    """On a clade-structured pangenome the meta and diff tiers must beat
    the hybrid size, diff strictly hardest (measured 2.55x at 596k sets,
    docs/DESIGN-NOTES.md §8). meta_diff chain-codes partial-id LISTS, whose
    per-changed-color cost is ~2 id entries vs diff's ~2 colors — on
    scattered-SNP corpora it ranks between meta and diff and at this tiny
    scale its fixed overheads (parents, offsets, headers) can exceed the
    savings, so its bar is overhead-bounded rather than strict."""
    from fulgor_tpu.build.builder import build_index
    from fulgor_tpu.build.color_builder import (
        check_conversion,
        diff_color,
        meta_color,
        meta_diff_color,
    )

    rng = np.random.default_rng(7)
    genomes = tree_genomes(rng)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp_path / f"g{i}.fa")
        write_fasta(p, seqs)
        paths.append(p)
    idx = build_index(paths, k=21, m=11)
    h = idx.color_store.num_bytes()
    for fn in (meta_color, diff_color):
        conv = fn(idx)
        assert check_conversion(idx, conv)
        assert conv.color_store.num_bytes() < h, f"{conv.kind} did not compress"
    conv = meta_diff_color(idx)
    assert check_conversion(idx, conv)
    assert conv.color_store.num_bytes() < 1.25 * h, "meta_diff overhead blew up"
