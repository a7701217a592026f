"""Diagnose the staged-probe flood on pansal4546 (round-4 measurement:
1.1k reads/s, 77% of reads redone).

Measures, on one 32k-read batch from the bench reads file:
  - stage A (vb1=2, no skew): hit / decided-miss / undecided window rates,
    per-read undecided-count (nU) distribution vs the RU=16 / BH=B//8 tiers
  - one-pass probe at (6,3) and (8,4): window + read ovf rates
  - covered_frac as the engine computes it (the staged/one-pass gate)
"""
import gzip
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_cache")


def load_reads(path, n, L=150):
    out = np.full((n, L), 4, dtype=np.uint8)
    lut = np.full(256, 4, dtype=np.uint8)
    for i, c in enumerate(b"ACGT"):
        lut[c] = i
    with gzip.open(path, "rb") as f:
        i = 0
        while i < n:
            h = f.readline()
            if not h:
                break
            seq = f.readline().strip()
            f.readline()
            f.readline()
            a = lut[np.frombuffer(seq, dtype=np.uint8)][:L]
            out[i, : len(a)] = a
            i += 1
    return out[:i]


def main():
    import jax.numpy as jnp

    from fulgor_tpu.index import Index
    from fulgor_tpu.ops import minidict2 as M2
    from fulgor_tpu.ops.lookup import pack_reads_host

    idx = Index.load(os.path.join(CACHE, "pansal4546.mini.tfur"))
    d = idx.minidict()
    reads = load_reads(os.path.join(CACHE, "pansal4546_reads_500000.fastq.gz"),
                       32768, L=160)
    B, L = reads.shape
    k, m = idx.k, d.m
    print(f"B={B} L={L} k={k} m={m} num_slots={d.num_slots}")

    # engine's covered_frac gate
    ms = d.slots.reshape(-1, 3)[:, 2]
    sp = (ms >> 8) & 0x7F
    cov = (ms >> 15) & 1
    occ = int(((sp > 0) | (cov == 1)).sum())
    covn = int((cov == 1).sum())
    print(f"covered_frac={covn / max(1, occ):.4f} (gate: <0.45 -> staged)")

    codes2, bad = pack_reads_host(reads)
    args = (jnp.asarray(d.slots), jnp.asarray(d.text32),
            jnp.asarray(d.sec_table))
    words, badw = M2.words_from_packed(jnp.asarray(codes2), jnp.asarray(bad))
    prep = M2._window_prep_from_words(words, badw, L, k, m)
    (minval, iL, iR, _pL, _pR, flo, fhi, rlo, rhi, usable) = prep

    # ---- stage A ----
    hit, val, cnt, need_sec = M2._probe_entries(
        *args, minval, iL, iR, flo, fhi, rlo, rhi, usable,
        k=k, m=m, num_slots=d.num_slots, vb=2, stage1=True)
    hit, cnt, need_sec, usable_np = map(np.asarray, (hit, cnt, need_sec, usable))
    nuse = usable_np.sum()
    undec = usable_np & ~hit & ((cnt > 2) | need_sec)
    nU = undec.sum(axis=1)
    print(f"stage A: usable windows {nuse}, hit {hit.sum() / nuse:.3f}, "
          f"undecided {undec.sum() / nuse:.4f} "
          f"(cnt>2: {(usable_np & ~hit & (cnt > 2)).sum() / nuse:.4f}, "
          f"need_sec: {(usable_np & ~hit & need_sec).sum() / nuse:.4f})")
    for thr in (0, 4, 8, 16, 32, 64):
        print(f"  reads with nU>{thr}: {(nU > thr).mean():.4f}")
    print(f"  heavy (nU>16) frac {(nU > 16).mean():.4f} vs B2 capacity 0.125")

    # ---- one-pass probes ----
    for vb, sc in ((6, 3), (8, 4)):
        t0 = time.perf_counter()
        h1, v1, o1 = M2._probe_entries(
            *args, minval, iL, iR, flo, fhi, rlo, rhi, usable,
            k=k, m=m, num_slots=d.num_slots, vb=vb, sc=sc)
        h1, o1 = np.asarray(h1), np.asarray(o1)
        dt = time.perf_counter() - t0
        print(f"one-pass ({vb},{sc}): hit {h1.sum() / nuse:.3f}, window ovf "
              f"{o1.sum() / max(1, nuse):.5f}, read ovf "
              f"{(o1.any(axis=1)).mean():.4f} (first-call {dt:.1f}s w/ compile)")

    # timed repeats of one-pass (6,3) vs staged defaults
    import jax

    f1 = jax.jit(lambda: M2._probe_entries(
        *args, minval, iL, iR, flo, fhi, rlo, rhi, usable,
        k=k, m=m, num_slots=d.num_slots, vb=6, sc=3)[0])
    f1().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        f1().block_until_ready()
    print(f"one-pass (6,3) probe: {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms")

    f2 = jax.jit(lambda: M2._probe_staged(
        args[0], args[1], args[2], prep, k, m, d.num_slots, 2, 8, 4, 16)[0])
    f2().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        f2().block_until_ready()
    print(f"staged (2,8,4,16) probe: {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
