"""The fulgor-tpu index (reference L4: include/index.hpp).

Composition (hybrid kind; meta/diff variants layer on the color-set store):

    k-mer dictionary : quotient cuckoo table (nb, 4) uint32 rows = two u64
                       slots [value | key-remainder | which-hash]; invertible
                       62-bit permutations make (bucket, remainder) identify
                       the key exactly with no key storage. Replaces SSHash
                       lookup with u2c folded in; the device probes it with
                       two 16-byte gathers per k-mer (ops/lookup.py).
    unitig text      : concatenated 2-bit packed bases + base offsets
                       (replaces SSHash's packed contigs; used by dump()/
                       check tooling, not by the query hot path).
    u2c              : dense uint32 unitig_id -> color_set_id (the reference
                       stores a boundary bitmap + rank9 — a CPU-ism; dense
                       gather is the TPU layout).
    color sets       : one of four stores (core/colorstores.py: hybrid /
                       meta / diff / meta-diff); expanded at load into a
                       dense bitset matrix (num_sets, ceil(C/32)) for the
                       device.
    filenames        : reference names in color-id order.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from . import INDEX_VERSION
from .constants import EXT, KIND_FROM_EXT
from .core import container
from .core import kmers as K
from .core.colorstores import STORE_CLASSES


def _print_nested(d, indent=0):
    pad = "  " * indent
    if isinstance(d, dict):
        for key, val in d.items():
            if isinstance(val, dict) or (
                isinstance(val, list) and val and isinstance(val[0], dict)
            ):
                print(f"{pad}{key}:")
                _print_nested(val, indent + 1)
            else:
                print(f"{pad}{key}: {val}")
    else:  # list of dicts
        for item in d:
            _print_nested(item, indent)


@dataclass
class Index:
    kind: str
    k: int
    m: int
    num_kmers: int
    num_colors: int
    filenames: list[str]

    dict_table: np.ndarray  # (nb, 4) uint32; value = color_set_id
    unitig_seq: np.ndarray  # uint64 2-bit packed concat
    unitig_offs: np.ndarray  # int64 (U+1,) base offsets
    u2c_csid: np.ndarray  # uint32 (U,)

    color_store: object  # Hybrid/Meta/Diff/MetaDiff store (core/colorstores)

    _dense_bits: np.ndarray | None = field(default=None, repr=False)
    _cs_cache: tuple | None = field(default=None, repr=False)

    # ------------------------------------------------ basic accessors

    @property
    def num_unitigs(self) -> int:
        return len(self.unitig_offs) - 1

    @property
    def num_color_sets(self) -> int:
        return self.color_store.num_color_sets

    def u2c(self, unitig_id: int) -> int:
        return int(self.u2c_csid[unitig_id])

    def color_set(self, cs_id: int) -> np.ndarray:
        cat, offs = self.color_sets_decoded()
        return cat[offs[cs_id] : offs[cs_id + 1]]

    def color_sets_decoded(self):
        """(cat u32, offs i64) for all sets, cached. For meta/meta-diff
        kinds the color ids are the PERMUTED ids (filenames are stored in
        the same permuted order, reference README.md:222-231)."""
        if self._cs_cache is None:
            self._cs_cache = self.color_store.decode_all()
        return self._cs_cache

    def unitig_codes(self, i: int) -> np.ndarray:
        lo, hi = int(self.unitig_offs[i]), int(self.unitig_offs[i + 1])
        w0, w1 = lo >> 5, (hi + 31) >> 5
        codes = K.unpack2(self.unitig_seq[w0:w1], (w1 - w0) * 32)
        return codes[lo - (w0 << 5) : hi - (w0 << 5)]

    def unitig_seq_str(self, i: int) -> str:
        return K.codes_to_seq(self.unitig_codes(i))

    # ------------------------------------------------ dense device view

    @property
    def words_per_set(self) -> int:
        return (self.num_colors + 31) // 32

    def dense_color_bits(self) -> np.ndarray:
        """(num_color_sets, ceil(C/32)) uint32 bitset matrix (cached).

        This is the TPU-side color-set representation: intersection is a
        gather + AND, threshold-union a (scores x bits) matmul. Memory is
        num_sets * C bits — fine up to ~10^10 bits; beyond that the meta/
        diff codecs with on-device decode take over (later rounds).
        """
        if self._dense_bits is None:
            cat, offs = self.color_sets_decoded()
            S, W = self.num_color_sets, self.words_per_set
            bits = np.zeros((S, W), dtype=np.uint32)
            rows = np.repeat(
                np.arange(S, dtype=np.int64), (offs[1:] - offs[:-1]).astype(np.int64)
            )
            cols = cat.astype(np.int64)
            np.bitwise_or.at(
                bits, (rows, cols >> 5), (np.uint32(1) << (cols & 31).astype(np.uint32))
            )
            self._dense_bits = bits
        return self._dense_bits

    # ------------------------------------------------ serialization

    def save(self, path: str):
        meta = {
            "index_version": list(INDEX_VERSION),
            "k": self.k,
            "m": self.m,
            "num_kmers": self.num_kmers,
            "num_colors": self.num_colors,
            "num_unitigs": self.num_unitigs,
            "num_color_sets": self.num_color_sets,
        }
        fn_blob = "\n".join(self.filenames).encode()
        cs_arrays, cs_extra = self.color_store.arrays()
        arrays = {
            "dict_table": self.dict_table,
            "unitig_seq": self.unitig_seq,
            "unitig_offs": self.unitig_offs,
            "u2c_csid": self.u2c_csid,
            "filenames": np.frombuffer(fn_blob, dtype=np.uint8),
        }
        for name, arr in cs_arrays.items():
            arrays["cs." + name] = arr
        container.save(
            path, kind=self.kind, meta=meta, extra={"color_store": cs_extra}, arrays=arrays
        )

    @classmethod
    def load(cls, path: str) -> "Index":
        c = container.Container(path)
        fn_blob = c.array("filenames").tobytes().decode()
        meta = c.meta
        store = STORE_CLASSES[c.kind].from_arrays(
            c.extra["color_store"], lambda name: c.array("cs." + name)
        )
        idx = cls(
            kind=c.kind,
            k=meta["k"],
            m=meta["m"],
            num_kmers=meta["num_kmers"],
            num_colors=meta["num_colors"],
            filenames=fn_blob.split("\n") if fn_blob else [],
            dict_table=c.array("dict_table"),
            unitig_seq=c.array("unitig_seq"),
            unitig_offs=c.array("unitig_offs"),
            u2c_csid=c.array("u2c_csid"),
            color_store=store,
        )
        assert meta["num_unitigs"] == idx.num_unitigs
        assert meta["num_color_sets"] == idx.num_color_sets
        return idx

    @staticmethod
    def path_for(basename: str, kind: str) -> str:
        return basename + EXT[kind]

    @staticmethod
    def kind_of(path: str) -> str:
        for ext, kind in KIND_FROM_EXT.items():
            if path.endswith(ext):
                return kind
        raise ValueError(f"unknown index extension: {path}")

    # ------------------------------------------------ stats

    def component_bytes(self) -> dict:
        return {
            "dictionary": int(self.dict_table.nbytes),
            "unitig_text": int(self.unitig_seq.nbytes + self.unitig_offs.nbytes),
            "color_sets": int(self.color_store.num_bytes()),
            "u2c": int(self.u2c_csid.nbytes),
            "filenames": sum(len(f) for f in self.filenames) + 4 * len(self.filenames),
        }

    def print_stats(self):
        comp = self.component_bytes()
        total = sum(comp.values())
        print(f"total index size: {total} [B] -- {total / 1e9:.5f} [GB]")
        print("SPACE BREAKDOWN:")
        for name, nbytes in comp.items():
            print(f"  {name}: {nbytes} bytes / {nbytes / 1e9:.5f} GB ({100.0 * nbytes / total:.3f}%)")
        cat, offs = self.color_sets_decoded()
        nints = len(cat)
        print(f"Color id range 0..{self.num_colors - 1}")
        print(f"Number of distinct color sets: {self.num_color_sets}")
        print(
            f"Number of ints in distinct color sets: {nints} "
            f"({8.0 * comp['color_sets'] / max(1, nints):.5f} bits/int)"
        )
        print(f"k: {self.k}")
        print(f"m: {self.m} (nominal minimizer length)")
        print(
            f"Number of kmers in dBG: {self.num_kmers} "
            f"({8.0 * (comp['dictionary'] + comp['unitig_text']) / max(1, self.num_kmers):.5f} bits/kmer)"
        )
        print(f"Number of unitigs in dBG: {self.num_unitigs}")
        print(f"color store [{self.kind}]:")
        _print_nested(self.color_store.stats(), indent=1)

    # ------------------------------------------------ dump / load (text interchange)

    def dump(self, basename: str):
        """Write the 4-file text dump (format: reference README.md:295-387)."""
        with open(basename + ".metadata.txt", "w") as f:
            f.write(f"k={self.k}\n")
            f.write(f"num_kmers={self.num_kmers}\n")
            f.write(f"num_colors={self.num_colors}\n")
            f.write(f"num_unitigs={self.num_unitigs}\n")
            f.write(f"num_color_sets={self.num_color_sets}\n")
        with open(basename + ".filenames.txt", "w") as f:
            for fn in self.filenames:
                f.write(fn + "\n")
        codes_all = K.unpack2(self.unitig_seq, int(self.unitig_offs[-1]))
        lut = np.frombuffer(b"ACGT", dtype=np.uint8)
        with open(basename + ".unitigs.fa", "wb") as f:
            for i in range(self.num_unitigs):
                f.write(b"> color_set_id=%d\n" % self.u2c_csid[i])
                seg = lut[codes_all[self.unitig_offs[i] : self.unitig_offs[i + 1]]]
                f.write(seg.tobytes())
                f.write(b"\n")
        cat, offs = self.color_sets_decoded()
        with open(basename + ".color_sets.txt", "w") as f:
            for s in range(self.num_color_sets):
                row = cat[offs[s] : offs[s + 1]]
                f.write(f"size={len(row)} " + " ".join(map(str, row)) + "\n")

    @classmethod
    def from_dump(cls, basename: str, m: int = 20) -> "Index":
        """GGCAT-free construction from dump files (reference src/index.cpp:122-305)."""
        from .build.builder import assemble_index

        meta = {}
        with open(basename + ".metadata.txt") as f:
            for line in f:
                key, val = line.strip().split("=")
                meta[key] = int(val)
        k = meta["k"]
        with open(basename + ".filenames.txt") as f:
            filenames = [ln.rstrip("\n") for ln in f if ln.strip()]
        from .native import lib as native

        codes_mat, lens, names = native.parse_reads(basename + ".unitigs.fa")
        ucs = np.array([int(n.split("=")[1]) for n in names], dtype=np.uint32)
        uoffs = np.concatenate([[0], np.cumsum(lens.astype(np.int64))])
        ucodes = np.concatenate(
            [codes_mat[i, : lens[i]] for i in range(len(lens))]
        ) if len(lens) else np.empty(0, np.uint8)
        sizes = []
        cols = []
        with open(basename + ".color_sets.txt") as f:
            for ln in f:
                parts = ln.split()
                n = int(parts[0].split("=")[1])
                assert n == len(parts) - 1
                sizes.append(n)
                cols.append(np.array(parts[1:], dtype=np.uint32))
        cs_offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        cs_colors = np.concatenate(cols).astype(np.uint32) if cols else np.empty(0, np.uint32)
        idx = assemble_index(
            k=k,
            m=m,
            num_colors=meta["num_colors"],
            filenames=filenames,
            unitig_codes=ucodes,
            unitig_offs=uoffs,
            unitig_cs=ucs,
            cs_colors=cs_colors,
            cs_offs=cs_offs,
        )
        assert idx.num_kmers == meta["num_kmers"], "kmer count mismatch vs dump metadata"
        return idx
