"""Device-side color-set algebra (replaces the reference's iterator leapfrog
machinery, src/ps_full_intersection.cpp / ps_threshold_union.cpp).

TPU formulation: distinct color sets live as a dense bitset matrix
(num_sets, ceil(C/32)) uint32 in HBM. Per read:

  full intersection  = gather rows of its distinct set ids, AND-reduce
                       (VPU, bitwise) -> (B, C32) result bits
  threshold union    = per-set k-mer multiplicities x unpacked bits matmul
                       (MXU, bf16/f32) -> (B, C) scores

The reference's sparse/complement iterator tricks are CPU-isms: on TPU the
dense AND/popcount form is memory-bound at full HBM bandwidth and has no
data-dependent control flow. (Scaling beyond dense-bits memory comes with
the meta/diff codecs in later rounds.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import INVALID_U32

INV = jnp.uint32(INVALID_U32)


def dedup_runs(win_csid: jax.Array, max_sets: int):
    """Per-row dedup of window color-set ids with multiplicities.

    win_csid: (B, W) uint32, INVALID for negative windows.
    -> csid (B, M) uint32 (INVALID padding), cnt (B, M) int32 (windows per
       set id), nsets (B,) int32, overflow (B,) bool.

    Sort-based: duplicates become adjacent runs; run starts index a compact
    scatter. Mirrors the reference's sort+unique on unitig ids then color
    set ids (src/ps_full_intersection.cpp:360-373) in fixed shapes.
    """
    B, W = win_csid.shape
    s = jnp.sort(win_csid, axis=1)
    valid = s != INV
    prev = jnp.concatenate([jnp.full((B, 1), INVALID_U32, dtype=jnp.uint32), s[:, :-1]], axis=1)
    is_new = valid & (s != prev)
    run = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1  # run index per window
    nsets = jnp.sum(is_new.astype(jnp.int32), axis=1)
    overflow = nsets > max_sets

    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, W))
    slot = jnp.where(is_new & (run < max_sets), run, max_sets)
    csid = jnp.full((B, max_sets + 1), INVALID_U32, dtype=jnp.uint32)
    csid = csid.at[rows, slot].set(s, mode="drop")
    cslot = jnp.where(valid & (run < max_sets), run, max_sets)
    cnt = jnp.zeros((B, max_sets + 1), dtype=jnp.int32)
    cnt = cnt.at[rows, cslot].add(valid.astype(jnp.int32), mode="drop")
    return csid[:, :max_sets], cnt[:, :max_sets], nsets, overflow


def full_intersection(dense_bits: jax.Array, csid: jax.Array, nsets: jax.Array):
    """AND of the dense bit rows of each read's distinct set ids.

    dense_bits: (S, C32) uint32; csid: (B, M) uint32 INVALID-padded.
    -> (B, C32) uint32; rows with nsets == 0 are all-zero (unmapped).
    """
    valid = csid != INV
    safe = jnp.where(valid, csid, 0).astype(jnp.int32)
    rows = jnp.take(dense_bits, safe, axis=0)  # (B, M, C32)
    rows = jnp.where(valid[:, :, None], rows, jnp.uint32(0xFFFFFFFF))
    out = rows[:, 0, :]
    for m in range(1, csid.shape[1]):
        out = out & rows[:, m, :]
    return jnp.where((nsets > 0)[:, None], out, jnp.uint32(0))


def threshold_union_scores(
    dense_bits: jax.Array,
    csid: jax.Array,
    cnt: jax.Array,
    num_colors: int,
    chunk: int = 8,
):
    """scores[b, c] = sum_m cnt[b, m] * bit(csid[b, m], c)  (MXU matmuls).

    -> (B, C) float32 (exact: counts <= W < 2^24).
    """
    B, M = csid.shape
    C32 = dense_bits.shape[1]
    C = C32 * 32
    valid = csid != INV
    safe = jnp.where(valid, csid, 0).astype(jnp.int32)
    cntf = jnp.where(valid, cnt, 0).astype(jnp.float32)

    shifts = jnp.arange(32, dtype=jnp.uint32)

    def step(acc, mc):
        ids, w = mc  # ids (B, chunk), w (B, chunk)
        rows = jnp.take(dense_bits, ids, axis=0)  # (B, chunk, C32)
        bits = ((rows[..., None] >> shifts) & jnp.uint32(1)).astype(jnp.float32)
        bits = bits.reshape(B, ids.shape[1], C32 * 32)
        acc = acc + jnp.einsum(
            "bm,bmc->bc", w, bits, preferred_element_type=jnp.float32
        )
        return acc, None

    pad = (-M) % chunk
    if pad:
        safe = jnp.pad(safe, ((0, 0), (0, pad)))
        cntf = jnp.pad(cntf, ((0, 0), (0, pad)))
    nchunks = safe.shape[1] // chunk
    ids_c = safe.reshape(B, nchunks, chunk).transpose(1, 0, 2)
    w_c = cntf.reshape(B, nchunks, chunk).transpose(1, 0, 2)
    acc0 = jnp.zeros((B, C), dtype=jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (ids_c, w_c))
    return acc[:, :num_colors]
