"""Host query orchestration (reference L7/L8: tools/pseudoalign.cpp et al.).

The reference's thread-pool-of-readers becomes: parse reads natively into
padded code matrices, bucket by length, stream fixed-shape batches through
the jitted device pipeline (async dispatch, fetched in a second pass so the
device stays busy), post-process/format on host. All device paths are exact;
the host mirrors (_host_*) exist for tooling and tests.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import INVALID_U32
from ..core import kmers as K
from ..index import Index
from ..ops.pipeline import (
    query_full_intersection,
    query_threshold_union,
    query_window_csids,
)
from .host_lookup import lookup_host
from .formatters import make_formatter


def _round_up(x, m):
    return -(-x // m) * m


def bucket_widths(lens: np.ndarray, k: int, max_buckets: int = 4):
    """Choose up to max_buckets padded widths (multiples of 32, >= k+31)."""
    if len(lens) == 0:
        return [k + 31]
    qs = np.quantile(lens, np.linspace(0, 1, max_buckets + 1)[1:], method="higher")
    widths = sorted({max(_round_up(int(q), 32), _round_up(k + 1, 32)) for q in qs})
    return widths


class QueryEngine:
    def __init__(self, index: Index, batch_size: int = 2048, max_sets: int = 64):
        self.idx = index
        self.batch = batch_size
        self.max_sets = max_sets
        self.k = index.k
        self.table = jnp.asarray(index.dict_table)
        self.bits = jnp.asarray(index.dense_color_bits())
        self._cs_cache = index.color_sets_decoded()

    # ---------------------------------------------------------------- helpers

    def _iter_batches(self, codes: np.ndarray, lens: np.ndarray):
        """Yield (read_indices, padded (B, W) int32 batch). Reads bucketed by
        length; each bucket streamed in fixed-size batches."""
        N = len(lens)
        widths = bucket_widths(lens, self.k)
        assign = np.searchsorted(widths, np.maximum(lens, self.k), side="left")
        assign = np.minimum(assign, len(widths) - 1)
        for wi, Wd in enumerate(widths):
            ridx = np.flatnonzero(assign == wi)
            for lo in range(0, len(ridx), self.batch):
                sel = ridx[lo : lo + self.batch]
                chunk = np.full((self.batch, Wd), 4, dtype=np.uint8)
                take = codes[sel]
                cols = min(Wd, take.shape[1])
                chunk[: len(sel), :cols] = take[:, :cols]
                yield sel, chunk

    def _host_csids(self, row_codes: np.ndarray):
        """Exact host window->csid for one read (slow path)."""
        km, valid = K.pack_kmers(row_codes.astype(np.uint8), self.k)
        out = np.full(len(km), INVALID_U32, dtype=np.uint32)
        if len(km) == 0:
            return out
        vals = lookup_host(self.idx.dict_table, K.canonicalize(km, self.k))
        hitm = valid & (vals != INVALID_U32)
        out[hitm] = vals[hitm]  # table values ARE color-set ids
        return out

    def _host_full_intersection(self, row_codes: np.ndarray) -> np.ndarray:
        cat, offs = self._cs_cache
        csids = self._host_csids(row_codes)
        distinct = np.unique(csids[csids != INVALID_U32])
        if len(distinct) == 0:
            return np.empty(0, dtype=np.uint32)
        acc = None
        for sid in distinct:
            s = cat[offs[sid] : offs[sid + 1]]
            acc = s if acc is None else np.intersect1d(acc, s, assume_unique=True)
            if len(acc) == 0:
                break
        return acc.astype(np.uint32)

    def _host_threshold(self, row_codes: np.ndarray, threshold: float) -> np.ndarray:
        cat, offs = self._cs_cache
        csids = self._host_csids(row_codes)
        pos = csids[csids != INVALID_U32]
        if len(pos) == 0:
            return np.empty(0, dtype=np.uint32)
        scores = np.zeros(self.idx.num_colors, dtype=np.int64)
        for sid in pos:
            scores[cat[offs[sid] : offs[sid + 1]].astype(np.int64)] += 1
        min_score = int(len(pos) * threshold)
        return np.flatnonzero(scores >= min_score).astype(np.uint32)

    @staticmethod
    def _bits_to_lists(bits_np: np.ndarray, num_colors: int):
        bm = np.unpackbits(bits_np.view(np.uint8), axis=1, bitorder="little")[
            :, :num_colors
        ].astype(bool)
        counts = bm.sum(axis=1)
        rows, cols = np.nonzero(bm)
        return np.split(cols.astype(np.uint32), np.cumsum(counts))[:-1], counts

    # ---------------------------------------------------------------- queries

    def pseudoalign_codes(self, codes: np.ndarray, lens: np.ndarray, threshold=None):
        """-> list (per read, input order) of sorted uint32 color arrays."""
        N = len(lens)
        results: list = [None] * N
        C = self.idx.num_colors
        # two-phase: enqueue every device batch (async dispatch), then fetch
        # in order — device compute overlaps host post-processing/transfer.
        pending = []
        for sel, chunk in self._iter_batches(codes, lens):
            if threshold is None:
                out = query_full_intersection(self.table, self.bits, chunk, k=self.k)
            else:
                out = query_threshold_union(
                    self.table, self.bits, chunk, k=self.k, num_colors=C
                )
            pending.append((sel, out))
        for sel, out in pending:
            nsel = len(sel)
            if threshold is None:
                lists, _ = self._bits_to_lists(np.asarray(out[:nsel]), C)
                for j, ridx in enumerate(sel):
                    results[ridx] = lists[j]
            else:
                scores = np.asarray(out[0][:nsel])
                npos = np.asarray(out[1][:nsel])
                min_score = (npos.astype(np.float64) * threshold).astype(np.int64)
                bm = (scores >= min_score[:, None]) & (npos > 0)[:, None]
                counts = bm.sum(axis=1)
                rows, cols = np.nonzero(bm)
                lists = np.split(cols.astype(np.uint32), np.cumsum(counts))[:-1]
                for j, ridx in enumerate(sel):
                    results[ridx] = lists[j]
        return results

    def window_csids_codes(self, codes: np.ndarray, lens: np.ndarray):
        """-> list (per read) of (hit bool (W_r,), csid u32 (W_r,))."""
        out: list = [None] * len(lens)
        for sel, chunk in self._iter_batches(codes, lens):
            hit, csid = query_window_csids(self.table, chunk, k=self.k)
            hit = np.asarray(hit[: len(sel)])
            csid = np.asarray(csid[: len(sel)])
            for j, ridx in enumerate(sel):
                w = max(0, int(lens[ridx]) - self.k + 1)
                if w > hit.shape[1]:  # read longer than bucket: host path
                    c = self._host_csids(codes[ridx][: lens[ridx]])
                    out[ridx] = (c != INVALID_U32, c)
                else:
                    out[ridx] = (hit[j, :w], csid[j, :w])
        return out

    def pseudoalign_codes_dedup(self, codes: np.ndarray, lens: np.ndarray):
        """--deduplicate path (reference fetch_and_deduplicate_sets,
        tools/pseudoalign.cpp:91-226): fetch per-read distinct color-set-id
        lists, group identical lists, intersect each DISTINCT list once on
        host dense bits, then fan results back out to reads."""
        N = len(lens)
        C = self.idx.num_colors
        dense = self.idx.dense_color_bits()
        ones = np.full(dense.shape[1], 0xFFFFFFFF, dtype=np.uint32)
        groups: dict[bytes, list[int]] = {}
        keys_per_read: list[bytes] = [b""] * N
        pending = []
        for sel, chunk in self._iter_batches(codes, lens):
            pending.append((sel, query_window_csids(self.table, chunk, k=self.k)))
        for sel, (hit, csid) in pending:
            csid = np.asarray(csid[: len(sel)])
            s = np.sort(csid, axis=1)
            uniq_mask = np.concatenate(
                [np.ones((len(sel), 1), dtype=bool), s[:, 1:] != s[:, :-1]], axis=1
            ) & (s != INVALID_U32)
            for j, ridx in enumerate(sel):
                key = s[j][uniq_mask[j]].tobytes()
                keys_per_read[ridx] = key
                groups.setdefault(key, []).append(int(ridx))
        results: list = [None] * N
        for key, readlist in groups.items():
            sids = np.frombuffer(key, dtype=np.uint32)
            if len(sids) == 0:
                colors = np.empty(0, dtype=np.uint32)
            else:
                acc = dense[sids.astype(np.int64)].copy()
                word = acc[0]
                for r in acc[1:]:
                    word &= r
                colors = np.flatnonzero(
                    np.unpackbits(word.view(np.uint8), bitorder="little")[:C]
                ).astype(np.uint32)
            for ridx in readlist:
                results[ridx] = colors
        return results

    # ---------------------------------------------------------------- file drivers

    def pseudoalign_file(
        self,
        query_path: str,
        out_path: str,
        threshold=None,
        fmt: str = "ascii",
        verbose: bool = False,
        deduplicate: bool = False,
    ):
        from ..native import lib as native

        t0 = time.perf_counter()
        codes, lens, _names = native.parse_reads(query_path)
        t_parse = time.perf_counter() - t0
        t0 = time.perf_counter()
        if deduplicate:
            assert threshold is None, "--deduplicate requires full-intersection"
            results = self.pseudoalign_codes_dedup(codes, lens)
        else:
            results = self.pseudoalign_codes(codes, lens, threshold)
        t_query = time.perf_counter() - t0
        t0 = time.perf_counter()
        fmtr = make_formatter(fmt, out_path, self.idx.num_colors)
        B = 1 << 16
        for lo in range(0, len(results), B):
            fmtr.write_batch(range(lo, min(len(results), lo + B)), results[lo : lo + B])
        fmtr.close()
        t_write = time.perf_counter() - t0
        num_mapped = sum(1 for r in results if len(r))
        stats = dict(
            num_reads=len(results),
            num_mapped=num_mapped,
            parse_sec=t_parse,
            query_sec=t_query,
            write_sec=t_write,
        )
        if verbose:
            n = max(1, len(results))
            total = t_parse + t_query + t_write
            print(f"mapped {len(results)} reads")
            print(
                f"elapsed = {total * 1e3:.0f} millisec / {total:.3f} sec / "
                f"{total / 60:.5f} min / {total * 1e6 / n:.4f} musec/read"
            )
            print(
                f"num_mapped_reads {num_mapped}/{len(results)} "
                f"({100.0 * num_mapped / n:.3f}%)"
            )
        return stats

    def kmer_conservation_file(self, query_path: str, out_path: str, verbose=False):
        from ..native import lib as native

        codes, lens, names = native.parse_reads(query_path)
        per_read = self.window_csids_codes(codes, lens)
        with open(out_path, "w", buffering=1 << 20) as f:
            for name, (hit, csid) in zip(names, per_read):
                triples = conservation_runs(hit, csid)
                if triples:
                    f.write(
                        f"{name}\t{len(triples)}\t"
                        + "\t".join(f"({p} {n} {i})" for p, n, i in triples)
                        + "\n"
                    )
                else:
                    f.write(f"{name}\t0\n")
        return dict(num_reads=len(names))

    def kmer_matches_file(self, query_path: str, out_path: str, verbose=False):
        from ..native import lib as native

        cat, offs = self._cs_cache
        codes, lens, names = native.parse_reads(query_path)
        per_read = self.window_csids_codes(codes, lens)
        C = self.idx.num_colors
        with open(out_path, "w", buffering=1 << 20) as f:
            f.write(f"num_colors={C}\n")
            for name, (hit, csid) in zip(names, per_read):
                counts = np.zeros(C, dtype=np.int64)
                for sid in csid[hit]:
                    counts[cat[offs[sid] : offs[sid + 1]].astype(np.int64)] += 1
                bitstr = "\t".join("1" if h else "0" for h in hit)
                cntstr = "\t".join(map(str, counts))
                if len(hit):
                    f.write(f"{name}\t{len(hit)}\t{bitstr}\t{cntstr}\n")
                else:
                    f.write(f"{name}\t0\t{cntstr}\n")
        return dict(num_reads=len(names))


def conservation_runs(hit: np.ndarray, csid: np.ndarray):
    """Maximal runs of consecutive positive windows with equal color-set id
    (reference src/kmer_conservation.cpp:6-54). -> [(start, len, csid)]."""
    triples = []
    cur_start, cur_len, cur_id = 0, 0, None
    for i in range(len(hit)):
        if hit[i]:
            sid = int(csid[i])
            if cur_id != sid:
                if cur_id is not None:
                    triples.append((cur_start, cur_len, cur_id))
                cur_start, cur_len, cur_id = i, 0, sid
            cur_len += 1
        else:
            if cur_id is not None:
                triples.append((cur_start, cur_len, cur_id))
            cur_id = None
    if cur_id is not None:
        triples.append((cur_start, cur_len, cur_id))
    return triples
