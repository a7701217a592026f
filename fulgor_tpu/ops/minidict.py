"""Minimizer-positional k-mer dictionary (the SSHash-class compact backend).

Where the quotient-cuckoo table (ops/lookup.py) stores one slot per k-mer
(~16-32 B/k-mer incl. load factor), this dictionary stores one entry per
*minimizer run* (~1/6.5 of the k-mers) plus the unitig text it verifies
against — ~2-3 B/k-mer all-in. The probe does more gathers per window
(bucket row + candidate entries + text rows), so it trades ~2x query speed
for ~6x index size; see docs/DESIGN-NOTES.md §2 for the measured trade and
the run-anchored variant that closes the speed gap (round 2).

Definitions (host build and device query MUST agree exactly):

* m-mer order: Hm = mix32(lo ^ mix32(hi ^ SEED_M)) of the CANONICAL m-mer
  (min of fwd/rc packings) — symmetric under reverse complement.
* window minimizer of the k-mer at position p: min of Hm over offsets
  [0, k-m]; the LEFTMOST argmin is the window's distinguished occurrence.
* entry per maximal run of consecutive k-mer positions (within a unitig)
  whose leftmost-minimizer POSITION j is constant:
      (wlo u32, csid u32, moff u8 | span u8)   [12 B]
  with wlo = first k-mer position (global text coords), span = run length
  (<= 255; longer runs split), moff = j - wlo.
* bucket = Hm(minimizer) & (NB-1); buckets hold entry ranges (sorted).
  Hash collisions merge buckets — harmless, exactness comes from text
  verification + bounds.
* text verification: candidate k-mer start for a read window w with
  leftmost argmin offset iL and rightmost iR:
      forward  q = (wlo + moff) - iL          (text == read substring)
      revcomp  q = (wlo + moff) - (k-m) + iR  (text == revcomp(read) substr)
  each candidate is accepted iff q lies in [wlo, wlo + span) and the
  62-bit text k-mer at q equals the window's fwd (resp. rc) packing.
  (The leftmost/rightmost asymmetry: reversing a window maps its RIGHTMOST
  minimizer occurrence to the leftmost of the reverse complement.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import INVALID_U32
from ..core import kmers as K

SEED_M = 0x713A9C5B
MAX_CANDIDATES = 8


# --------------------------------------------------------------------------
# shared scalar helpers (numpy)
# --------------------------------------------------------------------------


def _mix32_np(x):
    x = x.astype(np.uint32, copy=True)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x *= np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x


def mmer_hashes(codes: np.ndarray, m: int):
    """Canonical m-mer hash per position of a code array; invalid positions
    (non-ACGT) get 0xFFFFFFFF. -> uint32 (len-m+1,)."""
    km, valid = K.pack_kmers(codes, m)
    if len(km) == 0:
        return np.empty(0, np.uint32)
    can = K.canonicalize(km, m)
    lo = (can & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (can >> np.uint64(32)).astype(np.uint32)
    h = _mix32_np(lo ^ _mix32_np(hi ^ np.uint32(SEED_M)))
    # 0xFFFFFFFF is the poison value for invalid positions; remap natural
    # collisions so a valid window can never look poisoned
    h[h == np.uint32(0xFFFFFFFF)] = np.uint32(0xFFFFFFFE)
    h[~valid] = np.uint32(0xFFFFFFFF)
    return h


def sliding_min_argmin(h: np.ndarray, w: int):
    """min + LEFTMOST and RIGHTMOST argmin over each window of length w.
    -> (minval (n,), left (n,), right (n,)) with n = len(h)-w+1."""
    n = len(h) - w + 1
    if n <= 0:
        return (np.empty(0, np.uint32),) * 3
    # log-step tournament keeping (value, pos); ties prefer smaller pos for
    # left, larger pos for right
    valL = h.astype(np.uint64) << np.uint64(32)
    valL |= np.arange(len(h), dtype=np.uint64)  # tie -> smaller pos wins min
    valR = h.astype(np.uint64) << np.uint64(32)
    valR |= np.uint64(0xFFFFFFFF) - np.arange(len(h), dtype=np.uint64)
    span = 1
    aL, aR = valL.copy(), valR.copy()
    while span < w:
        step = min(span, w - span)
        aL[: len(aL) - step] = np.minimum(aL[: len(aL) - step], aL[step:])
        aR[: len(aR) - step] = np.minimum(aR[: len(aR) - step], aR[step:])
        span += step
    aL, aR = aL[:n], aR[:n]
    minval = (aL >> np.uint64(32)).astype(np.uint32)
    left = (aL & np.uint64(0xFFFFFFFF)).astype(np.int64) - np.arange(n)
    right = (
        np.uint64(0xFFFFFFFF) - (aR & np.uint64(0xFFFFFFFF))
    ).astype(np.int64) - np.arange(n)
    return minval, left.astype(np.int32), right.astype(np.int32)


def extract_text_kmer(text16: np.ndarray, q, k: int):
    """LSB-first 2k-bit k-mer at base position q from overlapping text rows.
    text16: (nrows, 3) uint32, row i = packed bases [16i, 16i+48).
    -> (lo u32, hi u32). Vectorized over q."""
    q = np.asarray(q, dtype=np.int64)
    row = text16[np.clip(q >> 4, 0, len(text16) - 1)]
    sh = (2 * (q & 15)).astype(np.uint32)
    w0, w1, w2 = row[..., 0], row[..., 1], row[..., 2]
    nz = sh > 0
    inv = np.where(nz, np.uint32(32) - sh, np.uint32(1))
    lo = np.where(nz, (w0 >> sh) | (w1 << inv), w0)
    hi = np.where(nz, (w1 >> sh) | (w2 << inv), w1)
    bits = 2 * k
    if bits <= 32:
        return lo & np.uint32((1 << bits) - 1) if bits < 32 else lo, np.zeros_like(hi)
    return lo, hi & np.uint32((1 << (bits - 32)) - 1)


def pack_text16(codes: np.ndarray):
    """Base codes -> overlapping (n, 3) uint32 rows, 16 bases/u32 LSB-first."""
    n = len(codes)
    nwords = (n + 15) // 16 + 2
    c = np.concatenate([codes & 3, np.zeros(nwords * 16 - n, dtype=np.uint8)]).astype(
        np.uint32
    )
    c = c.reshape(-1, 16)
    words = np.zeros(len(c), dtype=np.uint32)
    for i in range(16):
        words |= c[:, i] << np.uint32(2 * i)
    rows = np.stack(
        [words[:-2], words[1:-1], words[2:]], axis=1
    )
    return rows


def window_packings_lsb(codes: np.ndarray, k: int):
    """fwd and rc LSB-first 62-bit packings of every k-window.
    -> (flo, fhi, rlo, rhi, valid) each (n,)."""
    L = len(codes)
    n = L - k + 1
    if n <= 0:
        return (np.empty(0, np.uint32),) * 4 + (np.empty(0, bool),)
    c = codes.astype(np.uint32)
    flo = np.zeros(n, np.uint32)
    fhi = np.zeros(n, np.uint32)
    rlo = np.zeros(n, np.uint32)
    rhi = np.zeros(n, np.uint32)
    ok = np.ones(n, bool)
    for i in range(k):
        ci = c[i : i + n]
        ok &= ci <= 3
        if 2 * i < 32:
            flo |= (ci & 3) << np.uint32(2 * i)
        else:
            fhi |= (ci & 3) << np.uint32(2 * i - 32)
        cj = (3 - c[k - 1 - i : k - 1 - i + n]) & np.uint32(3)
        if 2 * i < 32:
            rlo |= cj << np.uint32(2 * i)
        else:
            rhi |= cj << np.uint32(2 * i - 32)
    return flo, fhi, rlo, rhi, ok


# --------------------------------------------------------------------------
# build
# --------------------------------------------------------------------------


@dataclass
class MiniDict:
    k: int
    m: int
    entries: np.ndarray  # (NE, 3) uint32 [wlo, csid, moff | span<<8]
    bucket_offs: np.ndarray  # (NB, 2) uint32 [start, count]
    text16: np.ndarray  # (nrows, 3) uint32 overlapping packed text

    def num_bytes(self) -> int:
        return int(self.entries.nbytes + self.bucket_offs.nbytes + self.text16.nbytes)


def build_minidict(unitig_codes, unitig_offs, unitig_cs, k, m) -> MiniDict:
    codes = np.asarray(unitig_codes, dtype=np.uint8)
    offs = np.asarray(unitig_offs, dtype=np.int64)
    ucs = np.asarray(unitig_cs, dtype=np.uint32)
    total = int(offs[-1])

    # per-position canonical m-mer hashes; poison positions crossing unitigs
    h = np.full(total, 0xFFFFFFFF, dtype=np.uint32)
    hm = mmer_hashes(codes, m)
    h[: len(hm)] = hm
    pos = np.arange(len(hm), dtype=np.int64)
    uid_m = np.searchsorted(offs, pos, side="right") - 1
    cross = (pos + m) > offs[uid_m + 1]
    h[: len(hm)][cross] = np.uint32(0xFFFFFFFF)

    # window minimizers (leftmost) for every kmer position
    w = k - m + 1
    minval, left, _right = sliding_min_argmin(h, w)
    nkpos = len(minval)
    kpos = np.arange(nkpos, dtype=np.int64)
    uid_k = np.searchsorted(offs, kpos, side="right") - 1
    valid_k = (kpos + k) <= offs[uid_k + 1]

    j = kpos + left  # global minimizer position per kmer window
    # runs: consecutive valid kmer positions with equal j
    prev_j = np.concatenate([[-2], j[:-1]])
    prev_valid = np.concatenate([[False], valid_k[:-1]])
    is_new = valid_k & (~prev_valid | (j != prev_j))
    starts = np.flatnonzero(is_new)
    # run ends: next new or invalid
    run_id = np.cumsum(is_new) - 1
    counts = np.bincount(run_id[valid_k], minlength=len(starts))

    # split runs longer than 255
    wlo_l, span_l, moff_l, csid_l, hash_l = [], [], [], [], []
    for s, c in zip(starts, counts):
        jj = int(j[s])
        hh = h[jj]
        cs = ucs[uid_k[s]]
        off = jj - int(s)
        p = int(s)
        remaining = int(c)
        while remaining > 0:
            take = min(remaining, 255)
            wlo_l.append(p)
            span_l.append(take)
            moff_l.append(jj - p)
            csid_l.append(cs)
            hash_l.append(hh)
            p += take
            remaining -= take
    NE = len(wlo_l)
    wlo = np.array(wlo_l, dtype=np.uint32)
    span = np.array(span_l, dtype=np.uint32)
    moff = np.array(moff_l, dtype=np.uint32)
    assert NE == 0 or (moff <= 255).all() and (span <= 255).all()
    csid = np.array(csid_l, dtype=np.uint32)
    hashes = np.array(hash_l, dtype=np.uint32)

    NB = 1
    while NB < max(2, NE):
        NB <<= 1
    bucket = hashes & np.uint32(NB - 1)
    order = np.argsort(bucket, kind="stable")
    entries = np.stack(
        [wlo[order], csid[order], moff[order] | (span[order] << np.uint32(8))], axis=1
    ).astype(np.uint32)
    cnt = np.bincount(bucket, minlength=NB)
    start = np.concatenate([[0], np.cumsum(cnt)])[:-1]
    bucket_offs = np.stack([start, cnt], axis=1).astype(np.uint32)
    return MiniDict(k, m, entries, bucket_offs, pack_text16(codes))


# --------------------------------------------------------------------------
# host-side query (oracle + slow path)
# --------------------------------------------------------------------------


def lookup_minidict_host(d: MiniDict, codes: np.ndarray):
    """Window lookup for one read -> (hit bool (Wk,), csid u32, overflow
    bool (Wk,)). Overflowed windows (bucket larger than MAX_CANDIDATES)
    report ovf=True and hit=False."""
    k, m = d.k, d.m
    L = len(codes)
    Wk = L - k + 1
    hit = np.zeros(max(0, Wk), dtype=bool)
    out = np.full(max(0, Wk), INVALID_U32, dtype=np.uint32)
    ovf = np.zeros(max(0, Wk), dtype=bool)
    if Wk <= 0:
        return hit, out, ovf
    h = mmer_hashes(codes, m)
    minval, left, right = sliding_min_argmin(h, k - m + 1)
    flo, fhi, rlo, rhi, okw = window_packings_lsb(codes, k)
    NB = len(d.bucket_offs)
    for p in range(Wk):
        if not okw[p] or minval[p] == 0xFFFFFFFF:
            continue
        b = int(minval[p]) & (NB - 1)
        start, cnt = d.bucket_offs[b]
        if cnt > MAX_CANDIDATES:
            ovf[p] = True
            continue
        for e in range(int(cnt)):
            wlo, cs, ms = d.entries[start + e]
            mo, sp = int(ms) & 0xFF, int(ms) >> 8
            mpos = int(wlo) + mo
            # forward
            qf = mpos - int(left[p])
            if int(wlo) <= qf < int(wlo) + sp:
                tlo, thi = extract_text_kmer(d.text16, np.array([qf]), k)
                if tlo[0] == flo[p] and thi[0] == fhi[p]:
                    hit[p] = True
                    out[p] = cs
                    break
            # reverse complement
            qr = mpos - (k - m) + int(right[p])
            if int(wlo) <= qr < int(wlo) + sp:
                tlo, thi = extract_text_kmer(d.text16, np.array([qr]), k)
                if tlo[0] == rlo[p] and thi[0] == rhi[p]:
                    hit[p] = True
                    out[p] = cs
                    break
    return hit, out, ovf


# --------------------------------------------------------------------------
# device (JAX) query — must mirror lookup_minidict_host exactly
# --------------------------------------------------------------------------


def _device():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def lookup_minidict_batch(entries, bucket_offs, text16, codes, *, k: int, m: int,
                          max_candidates: int = 4):
    """Batched minimizer-positional lookup on device.

    codes: (B, L) int-like base codes (0..3, >=4 invalid/pad).
    -> (hit (B, Wk) bool, csid (B, Wk) u32, ovf (B, Wk) bool). Windows whose
    bucket exceeds max_candidates report ovf (exact host fallback).
    """
    import jax
    import jax.numpy as jnp

    from .lookup import mix32, pack_windows

    B, L = codes.shape
    Wk = L - k + 1
    w = k - m + 1
    NB = bucket_offs.shape[0]

    # ---- canonical m-mer hashes (poison invalid) ----
    lo_m, hi_m, ok_m = pack_windows(codes, m)
    h = mix32(lo_m ^ mix32(hi_m ^ jnp.uint32(SEED_M)))
    h = jnp.where(h == jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFE), h)
    h = jnp.where(ok_m, h, jnp.uint32(0xFFFFFFFF))

    # ---- sliding min + leftmost/rightmost argmin (log-step tournament) ----
    Wm = h.shape[1]
    pos = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, Wm), 1), (B, Wm)
    )
    vL, pL = h, pos
    vR, pR = h, pos
    span = 1
    while span < w:
        step = min(span, w - span)
        bvL, bpL = vL[:, step:], pL[:, step:]
        avL, apL = vL[:, : vL.shape[1] - step], pL[:, : pL.shape[1] - step]
        takeL = (bvL < avL) | ((bvL == avL) & (bpL < apL))
        vL = jnp.where(takeL, bvL, avL)
        pL = jnp.where(takeL, bpL, apL)
        bvR, bpR = vR[:, step:], pR[:, step:]
        avR, apR = vR[:, : vR.shape[1] - step], pR[:, : pR.shape[1] - step]
        takeR = (bvR < avR) | ((bvR == avR) & (bpR > apR))
        vR = jnp.where(takeR, bvR, avR)
        pR = jnp.where(takeR, bpR, apR)
        span += step
    minval = vL[:, :Wk]
    kpos = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, Wk), 1), (B, Wk)
    )
    iL = pL[:, :Wk] - kpos  # offset of leftmost argmin within window
    iR = pR[:, :Wk] - kpos

    # ---- fwd/rc LSB-first window packings ----
    c = codes.astype(jnp.uint32)
    flo = jnp.zeros((B, Wk), jnp.uint32)
    fhi = jnp.zeros((B, Wk), jnp.uint32)
    rlo = jnp.zeros((B, Wk), jnp.uint32)
    rhi = jnp.zeros((B, Wk), jnp.uint32)
    okw = jnp.ones((B, Wk), bool)
    for i in range(k):
        ci = jax.lax.dynamic_slice_in_dim(c, i, Wk, axis=1)
        okw = okw & (ci <= 3)
        if 2 * i < 32:
            flo = flo | ((ci & 3) << (2 * i))
        else:
            fhi = fhi | ((ci & 3) << (2 * i - 32))
        cj = (jnp.uint32(3) - jax.lax.dynamic_slice_in_dim(c, k - 1 - i, Wk, axis=1)) & jnp.uint32(3)
        if 2 * i < 32:
            rlo = rlo | (cj << (2 * i))
        else:
            rhi = rhi | (cj << (2 * i - 32))

    # ---- bucket + candidate loop ----
    bucket = (minval & jnp.uint32(NB - 1)).astype(jnp.int32)
    brow = jnp.take(bucket_offs, bucket, axis=0)  # (B, Wk, 2)
    start = brow[..., 0].astype(jnp.int32)
    cnt = brow[..., 1].astype(jnp.int32)
    usable = okw & (minval != jnp.uint32(0xFFFFFFFF))
    ovf = usable & (cnt > max_candidates)

    bits = 2 * k
    if bits <= 32:
        lo_mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
        hi_mask = jnp.uint32(0)
    else:
        lo_mask = jnp.uint32(0xFFFFFFFF)
        hi_mask = jnp.uint32((1 << (bits - 32)) - 1)

    def extract(q):
        row = jnp.take(text16, jnp.clip(q >> 4, 0, text16.shape[0] - 1), axis=0)
        sh = (2 * (q & 15)).astype(jnp.uint32)
        w0, w1, w2 = row[..., 0], row[..., 1], row[..., 2]
        nz = sh > 0
        inv = jnp.where(nz, jnp.uint32(32) - sh, jnp.uint32(1))
        tlo = jnp.where(nz, (w0 >> sh) | (w1 << inv), w0)
        thi = jnp.where(nz, (w1 >> sh) | (w2 << inv), w1)
        return tlo & lo_mask, thi & hi_mask

    hit = jnp.zeros((B, Wk), bool)
    val = jnp.full((B, Wk), INVALID_U32, dtype=jnp.uint32)
    for e in range(max_candidates):
        has = usable & (e < cnt)
        eidx = jnp.where(has, start + e, 0).astype(jnp.int32)
        ent = jnp.take(entries, eidx, axis=0)  # (B, Wk, 3)
        wlo = ent[..., 0].astype(jnp.int32)
        cs = ent[..., 1]
        ms = ent[..., 2]
        mo = (ms & jnp.uint32(0xFF)).astype(jnp.int32)
        sp = (ms >> 8).astype(jnp.int32)
        mpos = wlo + mo
        for q, wl, wh in (
            (mpos - iL, flo, fhi),
            (mpos - (k - m) + iR, rlo, rhi),
        ):
            inb = has & (q >= wlo) & (q < wlo + sp)
            tlo, thi = extract(jnp.where(inb, q, 0))
            match = inb & (tlo == wl) & (thi == wh)
            new = match & ~hit
            val = jnp.where(new, cs, val)
            hit = hit | match
    hit = hit & ~ovf  # overflowed windows are unreliable: fallback decides
    return hit, jnp.where(hit, val, jnp.uint32(INVALID_U32)), ovf
