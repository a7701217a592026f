"""Host (numpy) mirror of the device cuckoo probe — oracle for ops/lookup.py
and fast path for build-time checks. Hash must match native/src/fulgor_native.cpp
(mix32 / CK_SEED1 / CK_SEED2) and ops/lookup.py exactly."""

from __future__ import annotations

import numpy as np

from ..constants import INVALID_U32

SEED1 = np.uint32(0x8BADF00D)
SEED2 = np.uint32(0x5EEDCAFE)


def mix32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32, copy=True)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x *= np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x


def buckets(lo: np.ndarray, hi: np.ndarray, num_buckets: int):
    nb = np.uint64(num_buckets)
    b1 = ((mix32(lo ^ mix32(hi ^ SEED1)).astype(np.uint64) * nb) >> np.uint64(32)).astype(np.uint32)
    b2 = ((mix32(lo ^ mix32(hi ^ SEED2)).astype(np.uint64) * nb) >> np.uint64(32)).astype(np.uint32)
    return b1, b2


def lookup_host(table: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """keys: uint64 canonical k-mers -> uint32 values (INVALID_U32 = miss)."""
    keys = np.asarray(keys, dtype=np.uint64)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    nb = table.shape[0]
    b1, b2 = buckets(lo, hi, nb)
    out = np.full(len(keys), INVALID_U32, dtype=np.uint32)
    for b in (b1, b2):
        rows = table[b.astype(np.int64)]  # (n, 6)
        for s in range(2):
            hit = (rows[:, s] == lo) & (rows[:, 2 + s] == hi)
            out[hit] = rows[hit, 4 + s]
    return out
