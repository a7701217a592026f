#!/usr/bin/env python
"""Benchmark: pseudoalignment throughput at the baseline workload's shape.

Prints ONE JSON line:
  {"metric": "pseudoalign_reads_per_sec", "value": N, "unit": "reads/s",
   "vs_baseline": N / 50600}

Baseline (BASELINE.md): the reference maps 6.58M real reads against its
4,546-genome Salmonella index (972k distinct color sets, 43.8M k-mers) at
19.76 us/read = ~50,600 reads/s with 8 CPU threads (README.md:171-177).

The PRIMARY corpus here matches that workload's *shape*, not just its code
path: a clade-structured synthetic pangenome of 1,024 genomes x 300 kb
(binary-tree evolution, ~15M k-mers, several hundred thousand distinct
color sets — the regime where the one-hot shortcut is off and every window
gathers a color row). The small salmonella_10 corpus (10 genomes) is also
reported on stderr for continuity with round-1 numbers, along with
per-stage timings and a gather-roofline line (the device's measured random
gather ceiling is ~28-51M rows/s; docs/DESIGN-NOTES.md §1).

Artifacts are cached under bench_cache/ (corpus + indexes + simulated
FASTQ); the first run builds them (~5-10 min), later runs skip to the
timed phase.
"""

import json
import os
import sys
import time

BASELINE_READS_PER_SEC = 50600.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cache")
SALMONELLA_DIR = "/root/reference/test_data/salmonella_10"
NUM_READS = int(os.environ.get("BENCH_NUM_READS", "500000"))
READ_LEN = 150
K = 31

# PRIMARY corpus (pansal4546): the baseline workload's published
# composition, all four stats (reference README.md:171-177,310-317):
#   4,546 colors | ~43.8M k-mers | ~972k distinct sets | ~23 k-mers/unitig
# Earlier rounds' primary (pan1k, below) matched counts but not STRUCTURE:
# uniform-SNP simulation shreds the union graph to ~1.3 windows/unitig,
# while the reference's real Salmonella index averages 23.3 k-mers/unitig
# (43.8M/1.88M) — the locality its streaming query path exploits
# (src/ps_full_intersection.cpp:341-353). A shredded corpus therefore
# *understates* any system against the reference's real-corpus number.
# pansal4546 reproduces the structure mechanistically: a finite accessory
# gene pool (gain/loss over a binary phylogeny) carries most distinct
# text in long blocks, with moderate per-branch SNPs — and SNPs land
# mostly on accessory text (ancestral_mut_frac): a length-weighted draw
# piles cumulative bubbles onto the small SHARED core coordinate space
# (0.26 sites/bp at full scale — measured) and shreds exactly the text
# most reads traverse, a bimodality real purifying-selected cores don't
# have. Calibrated from a measured 512-genome point (23.8M kmers / 229k
# unitigs / 116k sets at mut=65: ~33 kmers, ~3.3 unitigs, ~1.75 sets per
# SNP site); at 4,546 genomes the model lands on the reference column
# within a few percent, with ~1/27 bp bubble spacing on core and ~1/38
# on accessory (uniform read locality).
PANSAL = dict(num_genes=480, gene_len=2500, core_frac=0.6, loss_rate=0.03,
              mut_per_branch=65, ancestral_mut_frac=0.075,
              gain_per_branch=18, gain_len=2500, pool_genes=9000, seed=27)
PANSAL_GENOMES = 4546

# pan1k (secondary): scattered-SNP corpus — the shredded-graph stress
# case (no streaming locality; per-window color strategy).
PAN_GENOMES = 1024
PAN_LEN = 300_000
PAN_MUT = 300  # SNPs per tree branch (0.1%)

# BENCH_XL=1 adds a corpus at the FULL baseline composition (reference
# README.md:310-317: 4,546 colors, 43.8M kmers, 972k distinct sets): 4,546
# genomes x 500 kb with ~195 SNPs per tree branch — calibrated against the
# measured pan1k point (2046 edges x 300 SNPs x 31 x 0.80 kept = 15.6M
# kmers, 596k sets) to land at ~44M kmers / ~10^6 distinct sets. (The
# first cut, 1 Mb x 1000 SNPs, overshot to 152M kmers / 8.9M sets.)
# Building its artifacts takes ~1-2 h of host time; it is opt-in and
# reported alongside (never instead of) the pan1k primary.
XL_GENOMES = 4546
XL_LEN = 500_000
XL_MUT = 195


def _build_index(genome_paths, index_path, m):
    from fulgor_tpu.build.builder import build_index

    idx = build_index(genome_paths, k=K, m=m)
    idx.save(index_path)
    return index_path


def ensure_artifacts():
    os.makedirs(CACHE, exist_ok=True)
    out = {}

    # --- corpus 0 (PRIMARY): pansal4546, the baseline's composition AND
    # structure (see PANSAL above). ~45 min of host time on first build.
    ps_dir = os.path.join(CACHE, "pansal4546")
    ps_index = os.path.join(CACHE, "pansal4546.mini.tfur")
    ps_reads = os.path.join(CACHE, f"pansal4546_reads_{NUM_READS}.fastq.gz")
    if not os.path.exists(ps_index):
        from fulgor_tpu.build.builder import build_index
        from fulgor_tpu.io.simulate import simulate_pangenome_blocks

        print(
            f"[bench] generating pansal4546 corpus ({PANSAL_GENOMES} genomes, "
            f"gene pool {PANSAL['pool_genes']} x {PANSAL['gain_len']} bp)...",
            file=sys.stderr,
        )
        paths = simulate_pangenome_blocks(ps_dir, PANSAL_GENOMES, **PANSAL)
        print("[bench] building pansal4546 index (~40 min)...", file=sys.stderr)
        idx = build_index(paths, k=K, m=19, ram_gib=48.0, verbose=True)
        idx.save(ps_index)
    if not os.path.exists(ps_reads):
        from fulgor_tpu.io.simulate import simulate_reads, write_fastq

        ps_paths = sorted(
            os.path.join(ps_dir, f) for f in os.listdir(ps_dir)
            if f.endswith(".fa.gz")
        )
        print(f"[bench] simulating {NUM_READS} pansal4546 reads...",
              file=sys.stderr)
        codes, names = simulate_reads(ps_paths[::64], NUM_READS, READ_LEN, seed=4)
        write_fastq(ps_reads, codes, names)
    out["pansal"] = (ps_index, ps_reads)

    # --- corpus 1: salmonella_10 (10 real genomes; round-1 continuity) ---
    sal_index = os.path.join(CACHE, "salmonella_10.mini.tfur")
    sal_reads = os.path.join(CACHE, f"reads_{NUM_READS}.fastq.gz")
    sal_genomes = sorted(
        os.path.join(SALMONELLA_DIR, f)
        for f in os.listdir(SALMONELLA_DIR)
        if "fasta" in f
    )
    if not os.path.exists(sal_index):
        print("[bench] building salmonella_10 index...", file=sys.stderr)
        _build_index(sal_genomes, sal_index, m=19)
    if not os.path.exists(sal_reads):
        from fulgor_tpu.io.simulate import simulate_reads, write_fastq

        print(f"[bench] simulating {NUM_READS} salmonella reads...", file=sys.stderr)
        codes, names = simulate_reads(sal_genomes, NUM_READS, READ_LEN, seed=0)
        write_fastq(sal_reads, codes, names)
    out["sal"] = (sal_index, sal_reads)

    # --- corpus 2: pan1k (baseline-shaped: 1,024 genomes, >=100k sets) ---
    pan_dir = os.path.join(CACHE, "pan1k")
    pan_index = os.path.join(CACHE, "pan1k.mini.tfur")
    pan_reads = os.path.join(CACHE, f"pan1k_reads_{NUM_READS}.fastq.gz")
    if not os.path.exists(pan_index):
        from fulgor_tpu.io.simulate import simulate_pangenome

        print(
            f"[bench] generating pan1k corpus ({PAN_GENOMES} genomes x {PAN_LEN} bp)...",
            file=sys.stderr,
        )
        paths = simulate_pangenome(pan_dir, PAN_GENOMES, PAN_LEN, PAN_MUT, seed=3)
        print("[bench] building pan1k index...", file=sys.stderr)
        _build_index(paths, pan_index, m=19)
    if not os.path.exists(pan_reads):
        from fulgor_tpu.io.simulate import simulate_reads, write_fastq

        pan_paths = sorted(
            os.path.join(pan_dir, f) for f in os.listdir(pan_dir) if f.endswith(".fa.gz")
        )
        # sample reads from a subset of genomes (coverage pattern irrelevant;
        # keeps simulation time bounded)
        print(f"[bench] simulating {NUM_READS} pan1k reads...", file=sys.stderr)
        codes, names = simulate_reads(pan_paths[::16], NUM_READS, READ_LEN, seed=1)
        write_fastq(pan_reads, codes, names)
    out["pan"] = (pan_index, pan_reads)

    # --- corpus 3 (opt-in): pan4546, the baseline's full composition ---
    # BENCH_XL=1 builds its artifacts (hours of host time). Once they exist
    # they are always measured — the timed phase itself is minutes.
    xl_dir = os.path.join(CACHE, "pan4546")
    xl_index = os.path.join(CACHE, "pan4546.mini.tfur")
    xl_reads = os.path.join(CACHE, f"pan4546_reads_{NUM_READS}.fastq.gz")
    if os.environ.get("BENCH_XL") or (
        os.path.exists(xl_index) and os.path.exists(xl_reads)
    ):
        if not os.path.exists(xl_index):
            from fulgor_tpu.io.simulate import simulate_pangenome

            print(
                f"[bench] generating pan4546 corpus ({XL_GENOMES} genomes x "
                f"{XL_LEN} bp)...",
                file=sys.stderr,
            )
            paths = simulate_pangenome(xl_dir, XL_GENOMES, XL_LEN, XL_MUT, seed=7)
            print("[bench] building pan4546 index (hours)...", file=sys.stderr)
            from fulgor_tpu.build.builder import build_index

            idx = build_index(paths, k=K, m=19, ram_gib=48.0, verbose=True)
            idx.save(xl_index)
        if not os.path.exists(xl_reads):
            from fulgor_tpu.io.simulate import simulate_reads, write_fastq

            xl_paths = sorted(
                os.path.join(xl_dir, f)
                for f in os.listdir(xl_dir)
                if f.endswith(".fa.gz")
            )
            print(f"[bench] simulating {NUM_READS} pan4546 reads...", file=sys.stderr)
            codes, names = simulate_reads(xl_paths[::64], NUM_READS, READ_LEN, seed=2)
            write_fastq(xl_reads, codes, names)
        out["xl"] = (xl_index, xl_reads)
    return out


def timed_pseudoalign(eng, reads_path, out_path, label, runs=3, threshold=None):
    stats = eng.pseudoalign_file(reads_path, out_path, threshold=threshold)  # warm
    elapsed = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        stats = eng.pseudoalign_file(reads_path, out_path, threshold=threshold)
        elapsed = min(elapsed, time.perf_counter() - t0)
    rps = stats["num_reads"] / elapsed
    windows = stats["num_reads"] * (READ_LEN - K + 1)
    print(
        f"[bench] {label}: {stats['num_reads']} reads in {elapsed:.2f}s = "
        f"{rps:,.0f} reads/s (parse {stats['parse_sec']:.2f}s "
        f"query {stats['query_sec']:.2f}s host {stats.get('host_sec', 0.0):.2f}s "
        f"write {stats['write_sec']:.2f}s "
        f"redo {stats.get('num_redo', 0)} in {stats.get('redo_sec', 0.0):.2f}s); "
        f"mapped {stats['num_mapped']}",
        file=sys.stderr,
    )
    print(
        f"[bench] {label} roofline: {windows / elapsed / 1e6:.1f}M windows/s; "
        f"at ~5 gathers/window (dict rows + text verify + color row) = "
        f"{5 * windows / elapsed / 1e6:.0f}M gathers/s vs the ~28-51M/s "
        f"random-row ceiling (locality/coalescing provides the excess)",
        file=sys.stderr,
    )
    return rps, stats


def _device_reachable(timeout_sec: int = 900) -> bool:
    """Probe device init in a SUBPROCESS: a dead accelerator tunnel hangs
    jax.devices() in an uninterruptible retry loop, which would hang the
    whole bench. A child process can be timed out."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_sec, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _device_reachable():
        print("[bench] device init did not complete; accelerator unreachable",
              file=sys.stderr)
        print(json.dumps({
            "metric": "pseudoalign_reads_per_sec",
            "value": 0,
            "unit": "reads/s",
            "vs_baseline": 0,
            "error": "accelerator unreachable (device init timed out)",
        }))
        return

    import jax

    cache_dir = os.path.join(CACHE, "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    art = ensure_artifacts()

    from fulgor_tpu.index import Index
    from fulgor_tpu.query.engine import QueryEngine

    # /dev/null output matches the baseline command exactly (README.md:171:
    # `fulgor pseudoalign ... -o /dev/null`): formatting is still fully
    # paid, the disk write is not part of either measurement.
    out_path = os.environ.get("BENCH_OUT", "/dev/null")

    # PRIMARY: pansal4546 (the baseline's composition and structure)
    ps_index, ps_reads = art["pansal"]
    idx = Index.load(ps_index)
    import numpy as np

    nu = len(idx.unitig_offs) - 1
    print(
        f"[bench] pansal4546 index: {idx.num_kmers:,} kmers, {idx.num_colors} "
        f"colors, {idx.num_color_sets:,} distinct sets, {nu:,} unitigs "
        f"(kpu {idx.num_kmers / max(1, nu):.1f}) | reference workload: "
        f"43.8M kmers, 4546 colors, 972k sets, 1.88M unitigs (kpu 23.3)",
        file=sys.stderr,
    )
    eng = QueryEngine(idx, batch_size=32768)
    ps_rps, _ = timed_pseudoalign(eng, ps_reads, out_path,
                                  "pansal4546 full-intersection")
    del eng, idx

    result = {
        "metric": "pseudoalign_reads_per_sec",
        "value": round(ps_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(ps_rps / BASELINE_READS_PER_SEC, 3),
    }

    # SECONDARY: pan1k (scattered-SNP shredded-graph stress case)
    pan_index, pan_reads = art["pan"]
    idx = Index.load(pan_index)
    print(
        f"[bench] pan1k index: {idx.num_kmers:,} kmers, {idx.num_colors} colors, "
        f"{idx.num_color_sets:,} distinct sets",
        file=sys.stderr,
    )
    eng = QueryEngine(idx, batch_size=32768)
    timed_pseudoalign(eng, pan_reads, out_path, "pan1k full-intersection")
    del eng, idx

    # OPT-IN: pan4546 at the baseline's full composition (BENCH_XL=1)
    if "xl" in art:
        xl_index, xl_reads = art["xl"]
        idx = Index.load(xl_index)
        print(
            f"[bench] pan4546 index: {idx.num_kmers:,} kmers, {idx.num_colors} "
            f"colors, {idx.num_color_sets:,} distinct sets",
            file=sys.stderr,
        )
        eng = QueryEngine(idx, batch_size=32768)
        timed_pseudoalign(eng, xl_reads, out_path, "pan4546 full-intersection")
        del eng, idx

    # SECONDARY: salmonella_10 (continuity with round-1 numbers) + tools
    if not os.environ.get("BENCH_PRIMARY_ONLY"):
        sal_index, sal_reads = art["sal"]
        idx = Index.load(sal_index)
        eng = QueryEngine(idx, batch_size=32768)
        timed_pseudoalign(eng, sal_reads, out_path, "salmonella_10 full-intersection")
        for label, fn in [
            ("salmonella_10 threshold-union(0.8)",
             lambda: eng.pseudoalign_file(sal_reads, out_path, threshold=0.8)),
            ("salmonella_10 kmer-conservation",
             lambda: eng.kmer_conservation_file(sal_reads, out_path)),
            ("salmonella_10 kmer-matches",
             lambda: eng.kmer_matches_file(sal_reads, out_path)),
        ]:
            fn()  # warm (compile)
            t0 = time.perf_counter()
            s = fn()
            dt = time.perf_counter() - t0
            print(f"[bench] {label}: {s['num_reads'] / dt:,.0f} reads/s", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
