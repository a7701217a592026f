"""Prebuild bench_cache artifacts (host-only; no device needed).

Order: salmonella_10 (minutes) -> pansal4546 (primary) -> pan1k.
Run in background at session start so the driver's bench run is warm.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def run(name, fn):
    t0 = time.perf_counter()
    print(f"[prebuild] {name} starting", flush=True)
    try:
        fn()
        print(f"[prebuild] {name} done in {time.perf_counter() - t0:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[prebuild] {name} FAILED: {e!r}", flush=True)


run("salmonella_10", bench.ensure_salmonella)
run("pansal4546", bench.ensure_pansal)
run("pan1k", bench.ensure_pan1k)
print("[prebuild] all done", flush=True)
