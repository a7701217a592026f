"""Jitted end-to-end query steps (single chip). Multi-chip versions with
mesh sharding live in fulgor_tpu/parallel/mesh.py."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .intersect import dedup_runs, full_intersection, threshold_union_scores
from .lookup import lookup_batch


@partial(jax.jit, static_argnames=("k", "max_sets"))
def query_full_intersection(table, u2c_csid, dense_bits, codes, *, k: int, max_sets: int):
    """codes: (B, L) int32 -> (result_bits (B, C32) u32, nsets, overflow, hit)."""
    hit, _uid, csid = lookup_batch(table, u2c_csid, codes, k)
    csid_c, _cnt, nsets, ovf = dedup_runs(csid, max_sets)
    bits = full_intersection(dense_bits, csid_c, nsets)
    return bits, nsets, ovf, hit


@partial(jax.jit, static_argnames=("k", "max_sets", "num_colors"))
def query_threshold_union(
    table, u2c_csid, dense_bits, codes, *, k: int, max_sets: int, num_colors: int
):
    """-> (scores (B, C) f32, num_positive (B,) i32, overflow, hit)."""
    hit, _uid, csid = lookup_batch(table, u2c_csid, codes, k)
    csid_c, cnt, _nsets, ovf = dedup_runs(csid, max_sets)
    scores = threshold_union_scores(dense_bits, csid_c, cnt, num_colors)
    npos = jnp.sum(hit.astype(jnp.int32), axis=1)
    return scores, npos, ovf, hit


@partial(jax.jit, static_argnames=("k",))
def query_window_csids(table, u2c_csid, codes, *, k: int):
    """Per-window positivity + color-set id (kmer-conservation / kmer-matches
    drivers post-process on host). -> (hit (B, W) bool, csid (B, W) u32)."""
    hit, _uid, csid = lookup_batch(table, u2c_csid, codes, k)
    return hit, csid
