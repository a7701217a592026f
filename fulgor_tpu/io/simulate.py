"""Deterministic read simulation from reference FASTAs (bench + tests).

The reference benchmarks with SRR801268 (real SRA reads); with no network
egress we sample reads from the indexed genomes with a controlled error
rate, which exercises the identical code paths (hits, misses, multi-color
intersections)."""

from __future__ import annotations

import gzip

import numpy as np

from ..core import kmers as K


def load_genome_codes(path: str) -> np.ndarray:
    """Concatenated base codes of all records in a FASTA(.gz); records are
    separated by a single invalid code so windows never span records."""
    op = gzip.open if path.endswith(".gz") else open
    chunks = []
    with op(path, "rb") as f:
        data = f.read()
    for line in data.split(b"\n"):
        if line.startswith(b">"):
            chunks.append(np.array([4], dtype=np.uint8))
        elif line:
            chunks.append(K.seq_to_codes(line))
    return np.concatenate(chunks) if chunks else np.empty(0, np.uint8)


def simulate_reads(
    genome_paths: list[str],
    num_reads: int,
    read_len: int = 150,
    error_rate: float = 0.005,
    unmapped_frac: float = 0.1,
    seed: int = 0,
):
    """-> (codes (N, read_len) uint8, names list). Deterministic in seed."""
    rng = np.random.default_rng(seed)
    genomes = [load_genome_codes(p) for p in genome_paths]
    out = np.empty((num_reads, read_len), dtype=np.uint8)
    n_random = int(num_reads * unmapped_frac)
    gsel = rng.integers(0, len(genomes), size=num_reads)
    for i in range(num_reads):
        if i < n_random:
            out[i] = rng.integers(0, 4, size=read_len).astype(np.uint8)
            continue
        g = genomes[gsel[i]]
        while True:
            p = int(rng.integers(0, len(g) - read_len))
            seg = g[p : p + read_len]
            if (seg != 4).all():
                break
        seg = seg.copy()
        nerr = rng.binomial(read_len, error_rate)
        if nerr:
            pos = rng.choice(read_len, size=nerr, replace=False)
            seg[pos] = (seg[pos] + rng.integers(1, 4, size=nerr)) % 4
        out[i] = seg
    perm = rng.permutation(num_reads)
    return out[perm], [f"sim.{i}" for i in range(num_reads)]


def simulate_pangenome(
    out_dir: str,
    num_genomes: int,
    genome_len: int,
    mut_per_branch: int,
    seed: int = 0,
    gzip_files: bool = True,
) -> list[str]:
    """Clade-structured synthetic pangenome: binary-tree evolution from one
    ancestor, `mut_per_branch` SNPs per branch, leaves written as FASTA(.gz)
    in DFS order (only the first `num_genomes` leaves are materialized).
    Mirrors the regime the reference's meta/diff tiers target (many similar
    genomes, subtree-shaped color sets). Deterministic in seed.
    -> list of file paths (color order)."""
    import os

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    depth = max(1, int(np.ceil(np.log2(max(2, num_genomes)))))
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    anc = rng.integers(0, 4, size=genome_len).astype(np.uint8)
    paths: list[str] = []

    def mutate(g):
        c = g.copy()
        pos = rng.choice(genome_len, size=mut_per_branch, replace=False)
        c[pos] = (c[pos] + rng.integers(1, 4, size=mut_per_branch)) % 4
        return c

    ext = ".fa.gz" if gzip_files else ".fa"

    def emit(g):
        i = len(paths)
        p = os.path.join(out_dir, f"g{i:05d}{ext}")
        f_open = (
            (lambda: gzip.open(p, "wb", compresslevel=1))
            if gzip_files
            else (lambda: open(p, "wb"))
        )
        with f_open() as f:
            f.write(b">genome%d\n" % i)
            f.write(lut[g].tobytes())
            f.write(b"\n")
        paths.append(p)

    def dfs(g, d):
        if len(paths) >= num_genomes:
            return
        if d == depth:
            emit(g)
            return
        dfs(mutate(g), d + 1)
        dfs(mutate(g), d + 1)

    dfs(anc, 0)
    return paths


def simulate_pangenome_blocks(
    out_dir: str,
    num_genomes: int,
    num_genes: int = 400,
    gene_len: int = 2500,
    core_frac: float = 0.5,
    loss_rate: float = 0.04,
    mut_per_branch: int = 60,
    seed: int = 0,
    gzip_files: bool = True,
) -> list[str]:
    """Gene presence/absence pangenome (block-structured color sets).

    The ancestor is `num_genes` gene blocks of `gene_len` bp. Genomes
    descend a binary tree: each branch applies `mut_per_branch` SNPs and
    PERMANENTLY LOSES each non-core gene with probability `loss_rate`
    (losses inherit down the subtree). A leaf is the concatenation of its
    retained genes. k-mers of one gene appear in exactly the leaves that
    retain it, so color sets are unions of subtree complements — the block
    structure the reference's Salmonella meta/meta-diff ratios reflect
    (README.md:187-191), unlike the scattered-SNP corpora of
    simulate_pangenome. Deterministic in seed. -> paths (color order)."""
    import os

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    depth = max(1, int(np.ceil(np.log2(max(2, num_genomes)))))
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    genes = [rng.integers(0, 4, size=gene_len).astype(np.uint8)
             for _ in range(num_genes)]
    core = rng.random(num_genes) < core_frac
    paths: list[str] = []
    ext = ".fa.gz" if gzip_files else ".fa"

    def emit(gene_seqs, present):
        i = len(paths)
        p = os.path.join(out_dir, f"g{i:05d}{ext}")
        opener = (
            (lambda: gzip.open(p, "wb", compresslevel=1))
            if gzip_files
            else (lambda: open(p, "wb"))
        )
        seq = np.concatenate([gene_seqs[j] for j in range(num_genes) if present[j]])
        with opener() as f:
            f.write(b">genome%d\n" % i)
            f.write(lut[seq].tobytes())
            f.write(b"\n")
        paths.append(p)

    def mutate(gene_seqs, present):
        gs = [g.copy() for g in gene_seqs]
        flat = rng.choice(num_genes * gene_len, size=mut_per_branch, replace=False)
        for pos in flat:
            gi, off = divmod(int(pos), gene_len)
            gs[gi][off] = (gs[gi][off] + rng.integers(1, 4)) % 4
        pr = present & (core | (rng.random(num_genes) >= loss_rate))
        return gs, pr

    def dfs(gene_seqs, present, d):
        if len(paths) >= num_genomes:
            return
        if d == depth:
            emit(gene_seqs, present)
            return
        for _ in range(2):
            gs, pr = mutate(gene_seqs, present)
            dfs(gs, pr, d + 1)

    dfs(genes, np.ones(num_genes, dtype=bool), 0)
    return paths


def write_fastq(path: str, codes: np.ndarray, names: list[str]):
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wb") as f:
        qual = b"I" * codes.shape[1]
        for i, name in enumerate(names):
            f.write(b"@" + name.encode() + b"\n")
            f.write(lut[codes[i]].tobytes() + b"\n+\n" + qual + b"\n")
