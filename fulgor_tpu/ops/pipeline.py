"""Jitted end-to-end query steps (single chip). Multi-chip versions with
mesh sharding live in fulgor_tpu/parallel/mesh.py.

All steps are exact for every read — no dedup budget, no overflow fallback
(see ops/intersect.py). The color-algebra strategy is chosen statically by
the number of distinct color sets S:

    S <= ONEHOT_MAX_SETS  : comparison-reduce + MXU matmul (zero gathers)
    otherwise             : one bit-row gather per window + AND/matmul
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .intersect import (
    ONEHOT_MAX_SETS,
    full_intersection_onehot,
    full_intersection_windows,
    threshold_union_scores_onehot,
    threshold_union_scores_windows,
)
from .lookup import lookup_batch, unpack_reads


@partial(jax.jit, static_argnames=("k",))
def query_full_intersection(table, dense_bits, codes, *, k: int):
    """codes: (B, L) int32 -> result_bits (B, C32) u32. A read maps iff its
    result is non-empty (reference counts mapped reads the same way,
    tools/pseudoalign.cpp:42)."""
    hit, csid = lookup_batch(table, codes, k)
    if dense_bits.shape[0] <= ONEHOT_MAX_SETS:
        return full_intersection_onehot(dense_bits, hit, csid)
    return full_intersection_windows(dense_bits, hit, csid)


@partial(jax.jit, static_argnames=("k", "num_colors"))
def query_threshold_union(table, dense_bits, codes, *, k: int, num_colors: int):
    """-> (scores (B, C) f32, num_positive (B,) i32)."""
    hit, csid = lookup_batch(table, codes, k)
    if dense_bits.shape[0] <= ONEHOT_MAX_SETS:
        scores = threshold_union_scores_onehot(dense_bits, hit, csid, num_colors)
    else:
        scores = threshold_union_scores_windows(dense_bits, hit, csid, num_colors)
    npos = jnp.sum(hit.astype(jnp.int32), axis=1)
    return scores, npos


@partial(jax.jit, static_argnames=("k",))
def query_window_csids(table, codes, *, k: int):
    """Per-window positivity + color-set id (kmer-conservation / kmer-matches
    drivers post-process on host). -> (hit (B, W) bool, csid (B, W) u32)."""
    return lookup_batch(table, codes, k)


@partial(jax.jit, static_argnames=("k", "width"))
def query_full_intersection_packed(table, dense_bits, codes2, bad, *, k: int, width: int):
    codes = unpack_reads(codes2, bad, width)
    hit, csid = lookup_batch(table, codes, k)
    if dense_bits.shape[0] <= ONEHOT_MAX_SETS:
        return full_intersection_onehot(dense_bits, hit, csid)
    return full_intersection_windows(dense_bits, hit, csid)


@partial(jax.jit, static_argnames=("k", "width", "num_colors"))
def query_threshold_union_packed(
    table, dense_bits, codes2, bad, *, k: int, width: int, num_colors: int
):
    codes = unpack_reads(codes2, bad, width)
    hit, csid = lookup_batch(table, codes, k)
    if dense_bits.shape[0] <= ONEHOT_MAX_SETS:
        scores = threshold_union_scores_onehot(dense_bits, hit, csid, num_colors)
    else:
        scores = threshold_union_scores_windows(dense_bits, hit, csid, num_colors)
    npos = jnp.sum(hit.astype(jnp.int32), axis=1)
    return scores, npos


@partial(jax.jit, static_argnames=("k", "width"))
def query_window_csids_packed(table, codes2, bad, *, k: int, width: int):
    codes = unpack_reads(codes2, bad, width)
    return lookup_batch(table, codes, k)


@partial(jax.jit, static_argnames=("k", "width", "num_colors"))
def query_kmer_matches_packed(table, dense_bits, codes2, bad, *, k, width, num_colors):
    """kmer-matches (reference src/kmer_matches.cpp): per-window positivity
    plus counts[c] = #positive windows whose set contains c — identical
    algebra to the threshold-union scores matmul with unit weights."""
    codes = unpack_reads(codes2, bad, width)
    hit, csid = lookup_batch(table, codes, k)
    if dense_bits.shape[0] <= ONEHOT_MAX_SETS:
        scores = threshold_union_scores_onehot(dense_bits, hit, csid, num_colors)
    else:
        scores = threshold_union_scores_windows(dense_bits, hit, csid, num_colors)
    return hit, scores
