"""Device-side k-mer lookup (replaces SSHash streaming_query, SURVEY.md §3.2).

The reference's hottest loop is a per-k-mer minimizer-bucketed dictionary
probe with a streaming fast path. The TPU formulation is batch-parallel:

  1. pack every k-window of a (B, L) batch of 2-bit read codes into
     (hi, lo) uint32 pairs — O(k) static shift-adds on the VPU, no scan;
  2. canonicalize (min of forward / reverse-complement, big-endian order);
  3. probe a bucketed cuckoo table with 2 hashes x 4 slots: exactly two
     row gathers per k-mer, compare, select. No data-dependent loops.

Hash (mix32/seeds) must match native cuckoo_build and query/host_lookup.
All ops are uint32; TPUs have no native 64-bit integers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import INVALID_U32

SEED1 = 0x8BADF00D  # python ints: traced as uint32 at use sites
SEED2 = 0x5EEDCAFE


def mix32(x):
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def pack_reads_host(chunk):
    """Host-side 2-bit packing of a (B, W) uint8 code chunk (W % 32 == 0):
    -> (codes2 (B, W//4) uint8, bad (B, W//8) uint8 bitmask). Cuts the
    host->device transfer ~2.7x (the tunnel/PCIe is a pipeline stage)."""
    import numpy as np

    B, W = chunk.shape
    assert W % 32 == 0
    bad = chunk >= 4
    c = np.where(bad, 0, chunk).astype(np.uint8)
    codes2 = (
        c[:, 0::4] | (c[:, 1::4] << 2) | (c[:, 2::4] << 4) | (c[:, 3::4] << 6)
    ).astype(np.uint8)
    badm = np.packbits(bad, axis=1, bitorder="little")
    return codes2, badm


def unpack_reads(codes2: jax.Array, bad: jax.Array, width: int) -> jax.Array:
    """Device-side inverse of pack_reads_host -> (B, W) uint8-like codes
    (values 0..3, 4 for invalid/pad)."""
    B = codes2.shape[0]
    c = codes2.astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 2
    codes = ((c[:, :, None] >> shifts) & jnp.uint32(3)).reshape(B, width)
    b = bad.astype(jnp.uint32)
    bshifts = jnp.arange(8, dtype=jnp.uint32)
    badbits = ((b[:, :, None] >> bshifts) & jnp.uint32(1)).reshape(B, width)
    return jnp.where(badbits == 1, jnp.uint32(4), codes)


def pack_windows(codes: jax.Array, k: int):
    """codes: (B, L) int32 base codes (0..3 valid, >=4 pad/invalid).

    -> (lo, hi, valid): each (B, W=L-k+1); lo/hi uint32 canonical k-mer
    halves, valid bool (window inside read and all bases ACGT).
    """
    B, L = codes.shape
    W = L - k + 1
    assert W >= 1, "batch width shorter than k"
    c = codes.astype(jnp.uint32)
    zero = jnp.zeros((B, W), dtype=jnp.uint32)
    flo, fhi, rlo, rhi = zero, zero, zero, zero
    ok = jnp.ones((B, W), dtype=bool)
    for i in range(k):
        ci = jax.lax.dynamic_slice_in_dim(c, i, W, axis=1)
        ok = ok & (ci <= 3)
        bitpos = 2 * (k - 1 - i)  # forward: base i sits at bits 2(k-1-i)
        if bitpos < 32:
            flo = flo | (ci << bitpos)
        else:
            fhi = fhi | (ci << (bitpos - 32))
        # reverse complement: base at window offset (k-1-i) complements into
        # the same bit position
        cj = jax.lax.dynamic_slice_in_dim(c, k - 1 - i, W, axis=1)
        comp = (jnp.uint32(3) - cj) & jnp.uint32(3)
        if bitpos < 32:
            rlo = rlo | (comp << bitpos)
        else:
            rhi = rhi | (comp << (bitpos - 32))
    take_fwd = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
    lo = jnp.where(take_fwd, flo, rlo)
    hi = jnp.where(take_fwd, fhi, rhi)
    return lo, hi, ok


def _fastrange(h, nb: int):
    """floor(h * nb / 2^32) via 16-bit-limb mulhi (TPUs have no uint64).
    Must match native bucket_of / host_lookup.buckets exactly."""
    a0 = h & jnp.uint32(0xFFFF)
    a1 = h >> 16
    nb0, nb1 = nb & 0xFFFF, nb >> 16
    lo = a0 * jnp.uint32(nb0)
    t = a1 * jnp.uint32(nb0) + (lo >> 16)
    t2 = a0 * jnp.uint32(nb1) + (t & jnp.uint32(0xFFFF))
    return a1 * jnp.uint32(nb1) + (t >> 16) + (t2 >> 16)


def probe(table: jax.Array, lo: jax.Array, hi: jax.Array, valid: jax.Array):
    """Cuckoo probe: 2 hash choices x 2 slots. table: (nb, 6) uint32 rows
    [lo x2 | hi x2 | val x2]. -> (hit bool, val uint32)."""
    nb = table.shape[0]
    b1 = _fastrange(mix32(lo ^ mix32(hi ^ jnp.uint32(SEED1))), nb).astype(jnp.int32)
    b2 = _fastrange(mix32(lo ^ mix32(hi ^ jnp.uint32(SEED2))), nb).astype(jnp.int32)
    r1 = jnp.take(table, b1, axis=0)  # (..., 6)
    r2 = jnp.take(table, b2, axis=0)
    hit = jnp.zeros(lo.shape, dtype=bool)
    val = jnp.full(lo.shape, INVALID_U32, dtype=jnp.uint32)
    for rows in (r1, r2):
        for s in range(2):
            h = (rows[..., s] == lo) & (rows[..., 2 + s] == hi)
            hit = hit | h
            val = jnp.where(h, rows[..., 4 + s], val)
    hit = hit & valid
    val = jnp.where(hit, val, jnp.uint32(INVALID_U32))
    return hit, val


def lookup_batch(table, codes, k):
    """Full lookup: (B, L) codes -> per-window (hit, color_set_id).

    The dictionary value IS the color-set id: the reference's two-step
    contig_id -> rank1(u2c) (include/index.hpp:37) is folded into the table
    at build time, saving one gather per window on the TPU's
    transaction-limited gather path. Unitig identity lives host-side for
    tooling (dump/check/builders)."""
    lo, hi, ok = pack_windows(codes, k)
    hit, csid = probe(table, lo, hi, ok)
    return hit, csid
