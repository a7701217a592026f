"""Multi-chip query sharding (the reference is single-node shared-memory;
this is the TPU-native scale-out per SURVEY.md §2.3 / §5).

Mesh axes:
  'data'  — reads data-parallel (the reference's worker threads)
  'color' — the color dimension of the dense bitset matrix, sharded like a
            tensor-parallel weight: each device holds C32/cp of every set's
            bit words.

One query step over a (D, P) mesh:
  phase 1  every device runs k-mer lookup + dedup on its OWN slice of the
           batch (global batch sharded over BOTH axes -> lookup runs exactly
           once per read globally; the expensive gather is never duplicated);
  phase 2  `all_gather` of the compact per-read set ids along 'color' (tiny:
           M uint32 per read, rides ICI);
  phase 3  each device ANDs / matmuls its color-word shard for the gathered
           row-batch -> output sharded ('data', 'color').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.intersect import dedup_runs, full_intersection, threshold_union_scores
from ..ops.lookup import lookup_batch


def make_mesh(devices=None, data: int | None = None, color: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None or color is None:
        color = 2 if n % 2 == 0 and n >= 2 else 1
        data = n // color
    assert data * color == len(devices)
    dev = np.array(devices[: data * color]).reshape(data, color)
    return Mesh(dev, axis_names=("data", "color"))


def pad_bits_for_mesh(dense_bits: np.ndarray, color_shards: int) -> np.ndarray:
    S, C32 = dense_bits.shape
    pad = (-C32) % color_shards
    if pad:
        dense_bits = np.pad(dense_bits, ((0, 0), (0, pad)))
    return dense_bits


def make_sharded_full_intersection(mesh: Mesh, k: int, max_sets: int):
    """Returns a jitted fn(table, u2c, bits, codes) -> (bits_out, nsets, ovf).

    Global shapes: codes (B, L) with B % (D*P) == 0; bits (S, C32) with
    C32 % P == 0. Output bits_out (B, C32) sharded ('data', 'color').
    """

    def step(table, u2c, bits_shard, codes):
        hit, _uid, csid = lookup_batch(table, u2c, codes, k)
        csid_c, _cnt, nsets, ovf = dedup_runs(csid, max_sets)
        # phase 2: exchange compact ids along the color axis
        csid_all = jax.lax.all_gather(csid_c, "color", axis=0, tiled=True)
        nsets_all = jax.lax.all_gather(nsets, "color", axis=0, tiled=True)
        ovf_all = jax.lax.all_gather(ovf, "color", axis=0, tiled=True)
        out = full_intersection(bits_shard, csid_all, nsets_all)
        return out, nsets_all, ovf_all

    sm = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(None, "color"), P(("data", "color"), None)),
        out_specs=(P("data", "color"), P("data"), P("data")),
        check_vma=False,  # nsets/ovf become color-replicated via all_gather
    )
    return jax.jit(sm)


def make_sharded_threshold_union(mesh: Mesh, k: int, max_sets: int, num_colors_padded: int):
    """Like above; scores output (B, C_padded) sharded ('data', 'color').
    num_colors_padded must be 32*C32_padded (the caller slices to C)."""
    P_ = mesh.shape["color"]
    assert num_colors_padded % (32 * P_) == 0

    def step(table, u2c, bits_shard, codes):
        hit, _uid, csid = lookup_batch(table, u2c, codes, k)
        csid_c, cnt, _nsets, ovf = dedup_runs(csid, max_sets)
        csid_all = jax.lax.all_gather(csid_c, "color", axis=0, tiled=True)
        cnt_all = jax.lax.all_gather(cnt, "color", axis=0, tiled=True)
        npos = jnp.sum(hit.astype(jnp.int32), axis=1)
        npos_all = jax.lax.all_gather(npos, "color", axis=0, tiled=True)
        ovf_all = jax.lax.all_gather(ovf, "color", axis=0, tiled=True)
        scores = threshold_union_scores(
            bits_shard, csid_all, cnt_all, num_colors_padded // P_
        )
        return scores, npos_all, ovf_all

    sm = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(None, "color"), P(("data", "color"), None)),
        out_specs=(P("data", "color"), P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(sm)


def shard_inputs(mesh: Mesh, table, u2c, bits, codes):
    """Place arrays with the shardings the step functions expect."""
    rep = NamedSharding(mesh, P())
    return (
        jax.device_put(table, rep),
        jax.device_put(u2c, rep),
        jax.device_put(bits, NamedSharding(mesh, P(None, "color"))),
        jax.device_put(codes, NamedSharding(mesh, P(("data", "color"), None))),
    )
