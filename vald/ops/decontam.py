"""Benchmark decontamination (training-data curation op).

The standard recipe (public GPT-3 / PaLM / Llama appendix methodology):
flag any training document that shares at least one token ``width``-gram
with an evaluation/benchmark set, then drop (or report) the overlapping
docs so eval answers can't leak into training.

Computed EXACTLY on the gram strings — no hashing approximation — so a
DuckDB oracle can reproduce it (see queries.q_decontam).

Shape (100 TB): the eval side is small BY DEFINITION (benchmark suites
are thousands of documents, not billions), so its distinct gram set is
collected once on the driver, ``ray.put`` once, and membership-tested
per corpus batch with ``pc.is_in`` — the corpus streams, nothing
shuffles. ``max_eval_grams`` guards the broadcast assumption explicitly
instead of letting a mis-sized "eval set" OOM the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..hashing import stable_hash64
from .dedup import token_grams


def eval_gram_set(
    eval_ds: "ray.data.Dataset",
    text_col: str,
    *,
    width: int = 8,
    max_eval_grams: int = 50_000_000,
) -> pa.Array:
    """Distinct token ``width``-grams of the eval set, as one Arrow
    string array on the driver. Per-batch distinct first (one
    dictionary-encode), so the driver unions pre-deduped slabs."""

    def distinct_grams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        if len(t) == 0:
            return pa.table({"gram": pa.array([], type=pa.string())})
        grams, _, _ = token_grams(t, text_col, width)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], type=pa.string())})
        return pa.table({"gram": pc.unique(grams)})

    parts = ray.get(
        eval_ds.map_batches(
            distinct_grams, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    )
    parts = [p for p in parts if len(p)]
    if not parts:
        return pa.array([], type=pa.string())
    grams = pc.unique(pa.concat_tables(parts)["gram"].combine_chunks())
    if len(grams) > max_eval_grams:
        raise ValueError(
            f"eval set produced {len(grams)} distinct {width}-grams "
            f"(> max_eval_grams={max_eval_grams}); decontamination "
            "broadcasts the eval gram set — pass a real benchmark-sized "
            "eval set or raise the bound explicitly"
        )
    return grams


def eval_gram_hashes(
    eval_ds: "ray.data.Dataset",
    text_col: str,
    *,
    width: int = 8,
    max_eval_grams: int = 500_000_000,
) -> np.ndarray:
    """Distinct eval-set grams as a SORTED ``uint64`` hash array
    (``stable_hash64``) — the scale path past ``eval_gram_set``'s
    string broadcast: 8 bytes/gram flat instead of ~6×width bytes of
    string data, so the same driver/object-store budget holds an
    order of magnitude more grams (the default bound, 500M grams,
    broadcasts as 4 GB). Hash collisions turn into false POSITIVES at
    rate ≈ n/2^64 per corpus window (~3e-11 at the bound) — they can
    only over-count overlap / over-drop, never leak a contaminated
    doc. Per-batch distinct-then-hash keeps the driver union on
    pre-deduped uint64 slabs."""

    def distinct_hashes(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        if len(t) == 0:
            return pa.table({"h": pa.array([], type=pa.uint64())})
        grams, _, _ = token_grams(t, text_col, width)
        if len(grams) == 0:
            return pa.table({"h": pa.array([], type=pa.uint64())})
        h = np.unique(stable_hash64(pc.unique(grams)))
        return pa.table({"h": pa.array(h, type=pa.uint64())})

    parts = ray.get(
        eval_ds.map_batches(
            distinct_hashes, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    )
    parts = [p for p in parts if len(p)]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    h = np.unique(
        np.concatenate(
            [p["h"].to_numpy(zero_copy_only=False) for p in parts]
        ).astype(np.uint64)
    )
    if len(h) > max_eval_grams:
        raise ValueError(
            f"eval set produced {len(h)} distinct {width}-gram hashes "
            f"(> max_eval_grams={max_eval_grams}); even the hashed "
            "broadcast has a budget — pass a benchmark-sized eval set "
            "or raise the bound explicitly"
        )
    return h


# splitmix64 finalizer constants (public domain, Steele et al.) — used
# to derive the second Bloom probe stream from the siphash value
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _SM_M1
    h ^= h >> np.uint64(27)
    h *= _SM_M2
    h ^= h >> np.uint64(31)
    return h


class BloomFilter:
    """Vectorized Bloom filter over uint64 pre-hashes (Kirsch-Mitzenmacher
    double hashing: probe_i = h1 + i*h2 mod m). ``bits_per_key=16``
    gives FPR ≈ 4e-4 at k=11 — 1/4 the footprint of the sorted-hash
    array, the standard trade when the eval gram set outgrows even the
    hashed broadcast. False positives over-count overlap / over-drop
    only (same direction as hash collisions — never leaks)."""

    def __init__(self, hashes: np.ndarray, *, bits_per_key: int = 16):
        n = max(len(hashes), 1)
        self.m = np.uint64(((n * bits_per_key + 63) // 64) * 64)
        self.k = max(1, int(round(bits_per_key * 0.6931)))
        self.bits = np.zeros(int(self.m) // 8, dtype=np.uint8)
        if len(hashes):
            idx = self._probe(hashes.astype(np.uint64))
            np.bitwise_or.at(
                self.bits, (idx >> 3).astype(np.int64), (1 << (idx & 7)).astype(np.uint8)
            )

    def _probe(self, h: np.ndarray) -> np.ndarray:
        h1 = h
        h2 = _mix64(h) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % self.m).astype(np.uint64)

    def contains(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._probe(h.astype(np.uint64))
        byte = self.bits[(idx >> 3).astype(np.int64)]
        return ((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1).all(axis=1)


def decontaminate(
    ds: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    width: int = 8,
    mode: str = "stats",
    method: str = "exact",
    bits_per_key: int = 16,
    max_overlap: int = 0,
    max_eval_grams: int = 50_000_000,
) -> "ray.data.Dataset":
    """Eval-set n-gram overlap over a corpus.

    ``mode="stats"``: one row per doc with at least one window —
    ``(id_col, n_windows, n_eval_windows)`` where ``n_eval_windows``
    counts the doc's ``width``-gram windows that appear anywhere in
    ``eval_ds`` (zero-window docs are omitted, mirroring the SQL
    formulation).

    ``mode="filter"``: the clean corpus — input rows whose eval-gram
    overlap is <= ``max_overlap`` (docs with NULL text or fewer than
    ``width`` tokens have no windows, cannot be contaminated, and are
    kept).

    ``method`` picks the broadcast membership structure, in increasing
    scale / decreasing exactness order:

    - ``"exact"``: the distinct gram STRING set (``eval_gram_set``,
      default) — bit-exact, SQL-oracle-reproducible.
    - ``"hashed"``: sorted uint64 gram hashes (``eval_gram_hashes``) —
      8 bytes/gram broadcast, ~1e-11 false-positive rate from hash
      collisions; membership is a vectorized ``searchsorted``.
    - ``"bloom"``: ``BloomFilter`` over the same hashes —
      ``bits_per_key``/8 bytes per gram (default 2), FPR ≈ 4e-4 at the
      default 16 bits; the structure for eval sets that outgrow even
      the hashed broadcast.

    False positives in the approximate methods only over-count
    ``n_eval_windows`` / over-drop in filter mode — never under-report
    contamination.
    """
    if mode not in ("stats", "filter"):
        raise ValueError(f"mode must be 'stats' or 'filter', got {mode!r}")
    if method not in ("exact", "hashed", "bloom"):
        raise ValueError(
            f"method must be 'exact', 'hashed' or 'bloom', got {method!r}"
        )
    if method == "exact":
        struct_ref = ray.put(
            eval_gram_set(
                eval_ds, text_col, width=width, max_eval_grams=max_eval_grams
            )
        )
    else:
        hashes = eval_gram_hashes(
            eval_ds, text_col, width=width, max_eval_grams=max_eval_grams
        )
        struct_ref = ray.put(
            BloomFilter(hashes, bits_per_key=bits_per_key)
            if method == "bloom"
            else hashes
        )

    def _member(grams: pa.Array) -> np.ndarray:
        struct = ray.get(struct_ref)
        if method == "exact":
            if len(struct) == 0:
                return np.zeros(len(grams), dtype=bool)
            return np.asarray(
                pc.fill_null(
                    pc.is_in(grams, value_set=struct), False
                ).to_numpy(zero_copy_only=False),
                dtype=bool,
            )
        h = stable_hash64(grams)
        if method == "bloom":
            return struct.contains(h)
        if len(struct) == 0:
            return np.zeros(len(grams), dtype=bool)
        pos = np.searchsorted(struct, h)
        ok = pos < len(struct)
        ok[ok] = struct[pos[ok]] == h[ok]
        return ok

    def overlap(t: pa.Table) -> tuple[pa.Table, np.ndarray, np.ndarray]:
        """(non-null-text rows, n_windows, n_eval_windows) per row."""
        tt = t.filter(pc.is_valid(t[text_col]))
        if len(tt) == 0:
            return tt, np.empty(0, np.int64), np.empty(0, np.int64)
        grams, doc_idx, nw = token_grams(tt, text_col, width)
        hits = np.zeros(len(tt), dtype=np.int64)
        if len(grams):
            bad = _member(grams)
            hits = np.bincount(doc_idx[bad], minlength=len(tt)).astype(np.int64)
        return tt, nw, hits

    if mode == "stats":

        def stats(t: pa.Table) -> pa.Table:
            id_type = t.schema.field(id_col).type
            tt, nw, hits = overlap(t)
            keep = nw > 0
            return pa.table(
                {
                    id_col: tt[id_col].filter(pa.array(keep))
                    if len(tt)
                    else pa.array([], type=id_type),
                    "n_windows": pa.array(nw[keep]),
                    "n_eval_windows": pa.array(hits[keep]),
                }
            )

        return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)

    def clean(t: pa.Table) -> pa.Table:
        tt, _, hits = overlap(t)
        contaminated = tt.filter(pa.array(hits > max_overlap))
        if len(contaminated) == 0:
            return t
        drop = contaminated[id_col].combine_chunks()
        keep = pc.invert(
            pc.fill_null(pc.is_in(t[id_col], value_set=drop), False)
        )
        return t.filter(keep)

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
