"""Round-4 pansal4546 on-chip work, run as soon as the index exists.

Stages (select via argv[1]):
  profile  FI stage breakdown + probe-band A/B (the 1x-baseline push)
  tiers    meta/diff/meta-diff sizes + check --against on pansal4546
           (VERDICT round-3 item 4: the reference publishes 2.26-2.84x
           on the same-shaped corpus, README.md:187-191)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

INDEX = "/root/repo/bench_cache/pansal4546.mini.tfur"
READS = "/root/repo/bench_cache/pansal4546_reads_500000.fastq.gz"


def profile():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/bench_cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from fulgor_tpu.index import Index
    from fulgor_tpu.query.engine import QueryEngine

    idx = Index.load(INDEX)
    print(f"index: {idx.num_kmers:,} kmers {idx.num_colors} colors "
          f"{idx.num_color_sets:,} sets", flush=True)
    eng = QueryEngine(idx, batch_size=32768)
    print(f"probe band: {eng._pb} covered_frac={eng._covered_frac:.3f} "
          f"runs_fetch={eng.use_runs_fetch} R={eng._runs_R}", flush=True)
    s = eng.pseudoalign_file(READS, "/dev/null")  # warm
    for run in range(2):
        t0 = time.perf_counter()
        s = eng.pseudoalign_file(READS, "/dev/null")
        dt = time.perf_counter() - t0
        print(f"FI run{run}: {s['num_reads'] / dt:,.0f} reads/s "
              f"elapsed {dt:.2f}s parse {s['parse_sec']:.2f} "
              f"query {s['query_sec']:.2f} host {s['host_sec']:.2f} "
              f"write {s['write_sec']:.2f} redo {s['num_redo']} "
              f"in {s['redo_sec']:.2f}s", flush=True)


def tiers():
    from fulgor_tpu.build.color_builder import (
        check_conversion, diff_color, meta_color, meta_diff_color)
    from fulgor_tpu.index import Index

    idx = Index.load(INDEX)
    base_bytes = idx.color_store.num_bytes()
    print(f"hybrid color store: {base_bytes:,} B", flush=True)
    for name, fn, ext in (("meta", meta_color, ".tmfur"),
                          ("diff", diff_color, ".tdfur"),
                          ("meta-diff", meta_diff_color, ".tmdfur")):
        t0 = time.perf_counter()
        conv = fn(idx)
        dt = time.perf_counter() - t0
        nb = conv.color_store.num_bytes()
        ok = check_conversion(idx, conv)
        out = INDEX.replace(".tfur", ext)
        conv.save(out)
        print(f"{name}: {nb:,} B  ratio {base_bytes / nb:.2f}x  "
              f"build {dt:.0f}s  check={'OK' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    {"profile": profile, "tiers": tiers}[sys.argv[1]]()
