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
    compact_runs,
    pack_bool_bits,
    full_intersection_onehot,
    full_intersection_runs,
    full_intersection_windows,
    threshold_union_scores_onehot,
    threshold_union_scores_runs,
    threshold_union_scores_windows,
)
from .lookup import lookup_batch, unpack_reads

# With wide color rows (C32 > RUNS_MIN_WORDS) gathering one row per WINDOW
# is wasteful: collapse adjacent equal-csid windows into runs first (exact
# with max_runs = #windows) so a typical read gathers ~3 wide rows, not ~130.
RUNS_MIN_WORDS = 64


def _fi_dispatch(dense_bits, hit, csid):
    S, C32 = dense_bits.shape
    if S <= ONEHOT_MAX_SETS:
        return full_intersection_onehot(dense_bits, hit, csid)
    if C32 > RUNS_MIN_WORDS:
        run_csid, _cnt, _ovf = compact_runs(hit, csid, hit.shape[1])
        return full_intersection_runs(dense_bits, run_csid, jnp.any(hit, axis=1))
    return full_intersection_windows(dense_bits, hit, csid)


def _tu_dispatch(dense_bits, hit, csid, num_colors):
    S, C32 = dense_bits.shape
    if S <= ONEHOT_MAX_SETS:
        return threshold_union_scores_onehot(dense_bits, hit, csid, num_colors)
    if C32 > RUNS_MIN_WORDS:
        run_csid, run_cnt, _ovf = compact_runs(hit, csid, hit.shape[1])
        return threshold_union_scores_runs(dense_bits, run_csid, run_cnt, num_colors)
    return threshold_union_scores_windows(dense_bits, hit, csid, num_colors)


@partial(jax.jit, static_argnames=("k",))
def query_full_intersection(table, dense_bits, codes, *, k: int):
    """codes: (B, L) int32 -> result_bits (B, C32) u32. A read maps iff its
    result is non-empty (reference counts mapped reads the same way,
    tools/pseudoalign.cpp:42)."""
    hit, csid = lookup_batch(table, codes, k)
    return _fi_dispatch(dense_bits, hit, csid)


@partial(jax.jit, static_argnames=("k", "num_colors"))
def query_threshold_union(table, dense_bits, codes, *, k: int, num_colors: int):
    """-> (scores (B, C) f32, num_positive (B,) i32)."""
    hit, csid = lookup_batch(table, codes, k)
    scores = _tu_dispatch(dense_bits, hit, csid, num_colors)
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
    return _fi_dispatch(dense_bits, hit, csid)


@partial(jax.jit, static_argnames=("k", "width", "num_colors"))
def query_threshold_union_packed(
    table, dense_bits, codes2, bad, *, k: int, width: int, num_colors: int
):
    codes = unpack_reads(codes2, bad, width)
    hit, csid = lookup_batch(table, codes, k)
    scores = _tu_dispatch(dense_bits, hit, csid, num_colors)
    npos = jnp.sum(hit.astype(jnp.int32), axis=1)
    # scores are exact window counts < 2^16 (stream reads are <= 1024 bases;
    # longer reads take the host path) — narrow the fetch
    return scores.astype(jnp.uint16), npos.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "width"))
def query_window_csids_packed(table, codes2, bad, *, k: int, width: int):
    codes = unpack_reads(codes2, bad, width)
    return lookup_batch(table, codes, k)


def _pack_hits(hit):
    W = hit.shape[1]
    pad = (-W) % 32
    if pad:
        hit = jnp.pad(hit, ((0, 0), (0, pad)))
    return pack_bool_bits(hit)


@partial(jax.jit, static_argnames=("k", "width", "small_csid"))
def query_conservation_packed(table, codes2, bad, *, k, width, small_csid: bool):
    """kmer-conservation device step: positivity packed to bit words and
    csid narrowed to u16 when the set count allows — the device->host link
    is a pipeline stage (docs/DESIGN-NOTES.md §1)."""
    codes = unpack_reads(codes2, bad, width)
    hit, csid = lookup_batch(table, codes, k)
    hitw = _pack_hits(hit)
    if small_csid:
        csid_out = jnp.where(hit, csid, jnp.uint32(0xFFFF)).astype(jnp.uint16)
    else:
        csid_out = csid
    return hitw, csid_out


@partial(jax.jit, static_argnames=("k", "width", "num_colors"))
def query_kmer_matches_packed2(table, dense_bits, codes2, bad, *, k, width, num_colors):
    """kmer-matches with bit-packed positivity (fetch-size optimized)."""
    codes = unpack_reads(codes2, bad, width)
    hit, csid = lookup_batch(table, codes, k)
    scores = _tu_dispatch(dense_bits, hit, csid, num_colors)
    return _pack_hits(hit), scores.astype(jnp.uint16)
