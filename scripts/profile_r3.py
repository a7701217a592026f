#!/usr/bin/env python
"""Round-3 probe/color stage decomposition on the real chip (pan1k).

Times each pipeline stage in isolation to validate the gather cost model
(docs/DESIGN-NOTES.md §1, §9b) before rebuilding the anchored probe around
compacted run lanes. Timing rule on axon: force a scalar device->host fetch
per rep (block_until_ready returns early on this platform).

Usage: python scripts/profile_r3.py [stage ...]
Stages: prep probe color compact micro anchored
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_cache")

B = 32768
L = 160  # padded read length used by the streaming engine width ladder
K = 31


def timeit(label, fn, reps=5):
    """Times fn via ONE fused scalar reduction (a separate fetch per output
    array would add ~24 ms dispatch overhead each on the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    def reduced():
        r = fn()
        leaves = jax.tree_util.tree_leaves(r)
        acc = jnp.float32(0)
        for x in leaves:
            acc = acc + jnp.sum(x.astype(jnp.float32))
        return acc

    g = jax.jit(reduced)
    float(g())  # warm (compile)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g())
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:55s} {best * 1e3:9.1f} ms")
    return best


def main():
    stages = set(sys.argv[1:]) or {"prep", "probe", "color", "compact"}

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(CACHE, "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fulgor_tpu.index import Index
    from fulgor_tpu.ops import minidict2 as md2
    from fulgor_tpu.ops import intersect as its

    idx = Index.load(os.path.join(CACHE, "pan1k.mini.tfur"))
    print(f"index: {idx.num_kmers:,} kmers {idx.num_color_sets:,} sets "
          f"{idx.num_colors} colors")

    # the actual bench reads (real hit-rate distribution ~90%)
    rng = np.random.default_rng(0)
    md = idx.minidict()
    from fulgor_tpu.native.lib import ReadsStream

    reads_path = os.path.join(CACHE, "pan1k_reads_500000.fastq.gz")
    stream = ReadsStream(reads_path, B, row_len=L)
    codes, lens, _names = next(iter(stream))
    codes_j = jnp.asarray(codes[:, :L].astype(np.int32))

    (slots_np, text32_np, sec_np), (m, num_slots) = idx.device_dict()
    slots = jnp.asarray(slots_np)
    dtext32 = jnp.asarray(text32_np)
    sec = jnp.asarray(sec_np)
    dense_bits = jnp.asarray(idx.dense_color_bits())
    print(f"B={B} L={L} Wk={L - K + 1} slots={slots.shape} dense={dense_bits.shape}")

    if "prep" in stages:
        print("[prep]")
        prep = jax.jit(lambda c: md2._window_prep(c, K, m))
        timeit("window_prep (minimizers + packings)", lambda: prep(codes_j))

    if "parts" in stages:
        print("[parts] window_prep / merge decomposition")
        from fulgor_tpu.ops.lookup import mix32, pack_windows
        from fulgor_tpu.ops import intersect as I2

        Wk = L - K + 1

        def mmers(c):
            lo_m, hi_m, ok_m = pack_windows(c, m)
            return mix32(lo_m ^ mix32(hi_m ^ jnp.uint32(0x9E3779B1)))
        timeit(f"pack_windows(m={m}) + hash", lambda: jax.jit(mmers)(codes_j))

        def kpack(c):
            cc = c.astype(jnp.uint32)
            flo = jnp.zeros((B, Wk), jnp.uint32)
            fhi = jnp.zeros((B, Wk), jnp.uint32)
            rlo = jnp.zeros((B, Wk), jnp.uint32)
            rhi = jnp.zeros((B, Wk), jnp.uint32)
            okw = jnp.ones((B, Wk), bool)
            for i in range(K):
                ci = jax.lax.dynamic_slice_in_dim(cc, i, Wk, axis=1)
                okw = okw & (ci <= 3)
                cj = (jnp.uint32(3) - jax.lax.dynamic_slice_in_dim(
                    cc, K - 1 - i, Wk, axis=1)) & jnp.uint32(3)
                if 2 * i < 32:
                    flo = flo | ((ci & 3) << (2 * i))
                    rlo = rlo | (cj << (2 * i))
                else:
                    fhi = fhi | ((ci & 3) << (2 * i - 32))
                    rhi = rhi | (cj << (2 * i - 32))
            return flo, fhi, rlo, rhi, okw
        timeit(f"k-mer LSB pack loop (k={K})", lambda: jax.jit(kpack)(codes_j))

        def smin(c):
            h = mix32(c.astype(jnp.uint32))
            w = K - m + 1
            Wm = h.shape[1]
            posx = jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, (1, Wm), 1), (B, Wm))
            vL, pL, vR, pR = h, posx, h, posx
            span = 1
            while span < w:
                step = min(span, w - span)
                bvL, bpL = vL[:, step:], pL[:, step:]
                avL, apL = vL[:, : vL.shape[1] - step], pL[:, : pL.shape[1] - step]
                tL = (bvL < avL) | ((bvL == avL) & (bpL < apL))
                vL, pL = jnp.where(tL, bvL, avL), jnp.where(tL, bpL, apL)
                bvR, bpR = vR[:, step:], pR[:, step:]
                avR, apR = vR[:, : vR.shape[1] - step], pR[:, : pR.shape[1] - step]
                tR = (bvR < avR) | ((bvR == avR) & (bpR > apR))
                vR, pR = jnp.where(tR, bvR, avR), jnp.where(tR, bpR, apR)
                span += step
            return vL, pL, vR, pR
        timeit("sliding min-argmin (both sides)", lambda: jax.jit(smin)(codes_j))

        mask = jnp.asarray(rng.random((B, Wk)) < 0.15)
        timeit("jnp.cumsum (B,130) i32",
               jax.jit(lambda: jnp.cumsum(mask.astype(jnp.int32), axis=1)))
        timeit("mask_positions (R=37)",
               jax.jit(lambda: I2.mask_positions(mask, 37)))
        csidr = jnp.asarray(
            rng.integers(0, 500000, (B, Wk)).astype(np.uint32))
        hitm = jnp.asarray(rng.random((B, Wk)) < 0.9)
        timeit("compact_runs popcount (R=26)",
               jax.jit(lambda: I2.compact_runs(hitm, csidr, 26)))

    if "probe" in stages:
        print("[probe]")
        full = jax.jit(
            lambda c: md2.lookup_minidict2_batch(
                slots, dtext32, sec, c, k=K, m=m, num_slots=num_slots)
        )
        timeit("per-window probe (default)", lambda: full(codes_j))

        # probe minus skew: monkeypatchless variant — measure by gating skew off
        def probe_no_skew(c):
            (minval, iL, iR, _pL, _pR, flo, fhi, rlo, rhi, usable) = (
                md2._window_prep(c, K, m))
            import jax.numpy as jnp2
            # selection + verify only: call _probe_entries with a zero sec
            return md2._probe_entries(
                slots, dtext32, jnp.zeros((1, md2.SKEW_ROWW), jnp.uint32),
                minval, iL, iR, flo, fhi, rlo, rhi, usable,
                k=K, m=m, num_slots=num_slots)

        timeit("probe w/ empty skew table", lambda: jax.jit(probe_no_skew)(codes_j))

        hit, csid, ovf = full(codes_j)
        hitf = float(jnp.mean(hit.astype(jnp.float32)))
        print(f"  hit rate {hitf:.3f} ovf {float(jnp.mean(ovf.astype(jnp.float32))):.5f}")

    if "color" in stages:
        print("[color]")
        hit, csid, ovf = jax.jit(
            lambda c: md2.lookup_minidict2_batch(
                slots, dtext32, sec, c, k=K, m=m, num_slots=num_slots)
        )(codes_j)
        hit = jax.block_until_ready(hit)

        timeit("FI windows (gather every window row)",
               lambda: its.full_intersection_windows(dense_bits, hit, csid))
        for R in (16, 24, 32, 48):
            def fi_runs(R=R):
                rc, _cnt, _ovf = its.compact_runs(hit, csid, R)
                return its.full_intersection_runs(dense_bits, rc, jnp.any(hit, axis=1))
            timeit(f"FI runs (scatter compact R={R})", jax.jit(fi_runs))
        def cnt_runs():
            rc, cnt, ovf = its.compact_runs(hit, csid, 24)
            return rc, cnt, ovf
        timeit("compact_runs alone (scatter, R=24)", jax.jit(cnt_runs))
        rc, cnt, rovf = jax.jit(cnt_runs)()
        nr = jnp.sum((rc != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32), axis=1)
        print(f"  runs/read mean {float(jnp.mean(nr.astype(jnp.float32))):.1f} "
              f"p99 {int(jnp.percentile(nr.astype(jnp.float32), 99))} "
              f"ovf {float(jnp.mean(rovf.astype(jnp.float32))):.4f}")
        timeit("TU windows (chunked matmul)",
               lambda: its.threshold_union_scores_windows(dense_bits, hit, csid,
                                                          idx.num_colors))

    if "compact" in stages:
        print("[compact] popcount-based mask compaction cost")
        hit, csid, ovf = jax.jit(
            lambda c: md2.lookup_minidict2_batch(
                slots, dtext32, sec, c, k=K, m=m, num_slots=num_slots)
        )(codes_j)
        hit = jax.block_until_ready(hit)
        Wk = L - K + 1

        def popcount_compact(R=32):
            # pack is_new mask to u32 words, first_set_bits -> positions
            prev = jnp.concatenate(
                [jnp.full((B, 1), 0xFFFFFFFF, dtype=jnp.uint32), csid[:, :-1]],
                axis=1)
            prev_hit = jnp.concatenate([jnp.zeros((B, 1), bool), hit[:, :-1]],
                                       axis=1)
            is_new = hit & ((csid != prev) | ~prev_hit)
            pad = (-Wk) % 32
            mask = jnp.pad(is_new, ((0, 0), (0, pad)))
            bits = its.pack_bool_bits(mask)
            total, pos = its.first_set_bits(bits, R)
            rc = jnp.take_along_axis(csid, jnp.minimum(pos, Wk - 1), axis=1)
            valid = jnp.arange(R)[None, :] < total[:, None]
            rc = jnp.where(valid, rc, jnp.uint32(0xFFFFFFFF))
            return rc, total > R

        timeit("popcount compact runs (R=32)", jax.jit(popcount_compact))

        def fi_runs_pop(R=32):
            rc, ovfr = popcount_compact(R)
            return its.full_intersection_runs(dense_bits, rc, jnp.any(hit, axis=1))
        timeit("FI runs via popcount compact (R=32)", jax.jit(fi_runs_pop))

        # equivalence check vs scatter compaction
        rc1, _c1, _o1 = jax.jit(lambda: its.compact_runs(hit, csid, 32))()
        rc2, _o2 = jax.jit(popcount_compact)()
        ok = bool(jnp.all(rc1 == rc2))
        print(f"  popcount == scatter compaction: {ok}")

    if "micro" in stages:
        print("[micro] gather cost vs lane count / row width")
        for lanes in (3_932_160, 1_572_864, 524_288):
            idxs = jnp.asarray(rng.integers(0, slots.shape[0], lanes), jnp.int32)
            timeit(f"random 96B-row gather, {lanes / 1e6:.1f}M lanes",
                   jax.jit(lambda idxs=idxs: jnp.take(slots, idxs, axis=0)))
            idx2 = jnp.asarray(rng.integers(0, dtext32.shape[0], lanes), jnp.int32)
            timeit(f"random 16B-row gather, {lanes / 1e6:.1f}M lanes",
                   jax.jit(lambda idx2=idx2: jnp.take(dtext32, idx2, axis=0)))
            z = jnp.zeros(lanes, jnp.int32)
            timeit(f"coalesced (all-0) 96B gather, {lanes / 1e6:.1f}M lanes",
                   jax.jit(lambda z=z: jnp.take(slots, z, axis=0)))

    if "knobs" in stages:
        print("[knobs] probe round-count isolation (VERIFY_BUDGET / SKEW_CAND)")
        import fulgor_tpu.ops.minidict2 as MD

        base_vb, base_sc = MD.VERIFY_BUDGET, MD.SKEW_CAND
        for vb, sc in ((6, 3), (6, 2), (6, 1), (4, 3), (2, 3), (1, 3), (6, 0)):
            MD.VERIFY_BUDGET, MD.SKEW_CAND = vb, max(sc, 1)
            sc_eff = sc
            def run(c, vb=vb, sc=sc):
                prep = MD._window_prep(c, K, m)
                (minval, iL, iR, _pL, _pR, flo, fhi, rlo, rhi, usable) = prep
                if sc == 0:
                    # skew fully off: empty table, gate never fires
                    return MD._probe_entries(
                        slots, dtext32,
                        jnp.zeros((1, MD.SKEW_ROWW), jnp.uint32),
                        minval, iL, iR, flo, fhi, rlo, rhi, usable,
                        k=K, m=m, num_slots=num_slots)
                return MD._probe_entries(
                    slots, dtext32, sec, minval, iL, iR, flo, fhi, rlo, rhi,
                    usable, k=K, m=m, num_slots=num_slots)
            t = timeit(f"probe VB={vb} SC={sc_eff}", lambda: jax.jit(run)(codes_j))
            h, v, o = jax.jit(run)(codes_j)
            print(f"    hit {float(jnp.mean(h.astype(jnp.float32))):.3f} "
                  f"ovf_w {float(jnp.mean(o.astype(jnp.float32))):.5f} "
                  f"ovf_r {float(jnp.mean(jnp.any(o, 1).astype(jnp.float32))):.5f}")
        MD.VERIFY_BUDGET, MD.SKEW_CAND = base_vb, base_sc

    if "astage" in stages:
        print("[astage] anchored v2 internal decomposition")
        from fulgor_tpu.ops.intersect import mask_positions

        def stage1(c):
            """prep + anchor extraction + anchor probe."""
            prep = md2._window_prep(c, K, m)
            (minval, iL, iR, pLabs, pRabs, flo, fhi, rlo, rhi, usable) = prep
            Bx, Wk = minval.shape
            RA = md2.anchor_budget(Wk, K, m)
            prev_ok = jnp.concatenate([jnp.zeros((Bx, 1), bool), usable[:, :-1]], axis=1)
            sameL = jnp.concatenate([jnp.zeros((Bx, 1), bool), pLabs[:, 1:] == pLabs[:, :-1]], axis=1)
            sameR = jnp.concatenate([jnp.zeros((Bx, 1), bool), pRabs[:, 1:] == pRabs[:, :-1]], axis=1)
            is_start = usable & ~(prev_ok & sameL & sameR)
            next_ok = jnp.concatenate([usable[:, 1:], jnp.zeros((Bx, 1), bool)], axis=1)
            is_end = usable & ~(next_ok & jnp.concatenate(
                [sameL[:, 1:], jnp.zeros((Bx, 1), bool)], axis=1
            ) & jnp.concatenate([sameR[:, 1:], jnp.zeros((Bx, 1), bool)], axis=1))
            totS, posS = mask_positions(is_start, RA)
            _totE, posE = mask_positions(is_end, RA)
            lane = jnp.broadcast_to(jax.lax.broadcasted_iota(jnp.int32, (1, RA), 1), (Bx, RA))
            validS = lane < totS[:, None]
            probeE = validS & (posE > posS)
            posA = jnp.concatenate([posS, posE], axis=1)

            def gAx(a):
                return jnp.take_along_axis(a, posA, axis=1)

            laneok = jnp.concatenate([validS, probeE], axis=1)
            return md2._probe_entries(
                slots, dtext32, sec, gAx(minval), gAx(iL), gAx(iR), gAx(flo),
                gAx(fhi), gAx(rlo), gAx(rhi), laneok,
                k=K, m=m, num_slots=num_slots, gate=laneok, want_entry=True,
            )

        timeit("prep + anchor extract + anchor probe", lambda: jax.jit(stage1)(codes_j))

        def stage_runs(c):
            """prep + anchor masks + mask_positions only (no probe)."""
            prep = md2._window_prep(c, K, m)
            (minval, iL, iR, pLabs, pRabs, flo, fhi, rlo, rhi, usable) = prep
            Bx, Wk = minval.shape
            RA = md2.anchor_budget(Wk, K, m)
            prev_ok = jnp.concatenate([jnp.zeros((Bx, 1), bool), usable[:, :-1]], axis=1)
            sameL = jnp.concatenate([jnp.zeros((Bx, 1), bool), pLabs[:, 1:] == pLabs[:, :-1]], axis=1)
            sameR = jnp.concatenate([jnp.zeros((Bx, 1), bool), pRabs[:, 1:] == pRabs[:, :-1]], axis=1)
            is_start = usable & ~(prev_ok & sameL & sameR)
            totS, posS = mask_positions(is_start, RA)
            nb = jnp.mean(totS.astype(jnp.float32))
            return posS, nb

        timeit("prep + anchor masks + mask_positions", lambda: jax.jit(stage_runs)(codes_j))
        _, nruns = jax.jit(stage_runs)(codes_j)
        print(f"  mean minimizer runs/read: {float(nruns):.1f}")

    if "anchored" in stages:
        print("[anchored] compacted-lane anchored probe (v2)")
        anch = jax.jit(
            lambda c: md2.lookup_minidict2_batch_anchored(
                slots, dtext32, sec, c, k=K, m=m, num_slots=num_slots)
        )
        timeit("anchored probe v2 (defaults)", lambda: anch(codes_j))
        h, v, o = anch(codes_j)
        print(f"  hit {float(jnp.mean(h.astype(jnp.float32))):.3f} "
              f"ovf {float(jnp.mean(o.astype(jnp.float32))):.5f} "
              f"ovf reads {float(jnp.mean(jnp.any(o, axis=1).astype(jnp.float32))):.5f}")
        full = jax.jit(
            lambda c: md2.lookup_minidict2_batch(
                slots, dtext32, sec, c, k=K, m=m, num_slots=num_slots)
        )
        hf, vf, of = full(codes_j)
        agree = bool(jnp.all((~np.asarray(o)) <= (np.asarray(h) == np.asarray(hf))
                             | np.asarray(of)))
        print(f"  windows where decided results differ from per-window: "
              f"{int(jnp.sum(((h != hf) & ~o & ~of).astype(jnp.int32)))}")

    if "cal" in stages:
        print("[cal] dispatch overhead + small-op costs")
        tiny = jnp.zeros(8, jnp.float32)
        timeit("null (sum of 8 floats)", jax.jit(lambda: jnp.sum(tiny)))
        hit, csid, ovf = jax.jit(
            lambda c: md2.lookup_minidict2_batch(
                slots, dtext32, sec, c, k=K, m=m, num_slots=num_slots)
        )(codes_j)
        hit = jax.block_until_ready(hit)
        pos32 = jnp.asarray(rng.integers(0, L - K + 1, (B, 32)), jnp.int32)
        timeit("take_along_axis (B,130)->(B,32)",
               jax.jit(lambda: jnp.take_along_axis(csid, pos32, axis=1)))
        prep2 = jax.jit(lambda c: md2._window_prep(c, K, m))
        timeit("window_prep (minimizers + packings)", lambda: prep2(codes_j))


if __name__ == "__main__":
    main()
