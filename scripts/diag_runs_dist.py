"""Distinct-run-count distribution on pansal4546 reads (sizes the runs
FI fetch budget R: reads with more than R distinct csids overflow to the
row-gather recovery)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.diag_pansal_probe import CACHE, load_reads  # noqa: E402


def main():
    import jax.numpy as jnp

    from fulgor_tpu.index import Index
    from fulgor_tpu.ops import minidict2 as M2
    from fulgor_tpu.ops.lookup import pack_reads_host

    idx = Index.load(os.path.join(CACHE, "pansal4546.mini.tfur"))
    d = idx.minidict()
    reads = load_reads(os.path.join(CACHE, "pansal4546_reads_500000.fastq.gz"),
                       32768, L=160)
    codes2, bad = pack_reads_host(reads)
    hit, csid, ovf = M2.lookup_minidict2_packed(
        jnp.asarray(d.slots), jnp.asarray(d.text32), jnp.asarray(d.sec_table),
        jnp.asarray(codes2), jnp.asarray(bad),
        width=160, k=idx.k, m=d.m, num_slots=d.num_slots, probe_budget=(8, 4))
    csid = np.asarray(jnp.where(hit, csid, jnp.uint32(0xFFFFFFFF)))
    s = np.sort(csid, axis=1)
    keep = s != np.uint32(0xFFFFFFFF)
    keep[:, 1:] &= s[:, 1:] != s[:, :-1]
    nd = keep.sum(axis=1)
    print("distinct csids per read percentiles:")
    for p in (50, 75, 90, 95, 97.5, 99, 99.5, 100):
        print(f"  p{p}: {np.percentile(nd, p):.0f}")
    for R in (32, 48, 64, 80, 96, 128):
        print(f"  ovf frac at R={R}: {(nd > R).mean():.4f}")


if __name__ == "__main__":
    main()
