"""Deduplication operators (exact, MinHash-LSH, SimHash, n-gram
Jaccard) — Ray-Data-first.

Shuffle discipline: nothing here ever moves document bodies through an
all-to-all. Exact dedup shuffles (hash, id) pairs; MinHash shuffles
(band_hash, id, signature) rows; SimHash shuffles (chunk_value, id,
simhash). Candidate pairs are verified where they are grouped; only the
(tiny) verified pair list reaches the driver for the union-find.

Partitioning assumption (documented per SURVEY.md "custom operators"):
near-dup clustering runs union-find on the driver over VERIFIED pairs —
correct while the verified-pair count is driver-sized (pairs ≈
duplicates, not corpus size). For corpora where near-dup pairs
themselves exceed driver memory, raise `bands`' selectivity (higher
threshold) or switch `components_distributed=True` (iterative min-label
propagation, bounded rounds).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..hashing import stable_hash64

__all__ = [
    "exact_dedup",
    "distinct_count",
    "minhash_signatures",
    "minhash_dedup_pairs",
    "near_dup_groups",
    "simhash_column",
    "simhash_dedup_pairs",
    "ngram_jaccard",
]

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# exact dedup (B11): content-hash → bucket groupby → keep first
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: "ray.data.Dataset",
    on: str,
    *,
    id_col: str | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Drop exact-duplicate rows by the value of ``on`` (e.g. text or a
    precomputed content_sha). Keeps the row with the smallest ``id_col``
    (deterministic across parallelism); without ``id_col``, keeps an
    arbitrary-but-single row per value.

    Plan: map_batches adds (h, bucket) → groupby(bucket) →
    local group-by-hash keep-min inside map_groups. Document bodies move
    once (with their row), never in the aggregate."""

    def stamp(t: pa.Table) -> pa.Table:
        h = stable_hash64(t[on])
        t = t.append_column("__h", pa.array(h, type=pa.uint64()))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def keep_first(g: pa.Table) -> pa.Table:
        if id_col is not None:
            order = [(id_col, "ascending")]
            g = g.sort_by([("__h", "ascending")] + order)
        else:
            g = g.sort_by([("__h", "ascending")])
        # first row per __h run
        h = g["__h"].to_numpy(zero_copy_only=False)
        first = np.ones(len(g), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        return g.filter(pa.array(first)).drop_columns(["__h", "__bucket"])

    return (
        ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(keep_first, batch_format="pyarrow")
    )


def distinct_count(ds: "ray.data.Dataset", on: str, num_buckets: int = 64) -> int:
    """Exact COUNT(DISTINCT on) via per-batch local distinct →
    bucket groupby → per-bucket distinct count. Only hashes shuffle."""

    def pre(t: pa.Table) -> pa.Table:
        h = np.unique(stable_hash64(t[on].drop_null()))
        return pa.table(
            {
                "h": pa.array(h, type=pa.uint64()),
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            }
        )

    def count_bucket(g: pa.Table) -> pa.Table:
        n = len(np.unique(g["h"].to_numpy(zero_copy_only=False)))
        return pa.table({"n": pa.array([n], type=pa.int64())})

    out = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
    )
    return int(out.sum("n") or 0)


# ---------------------------------------------------------------------------
# MinHash + LSH (shingle → minhash → band → bucket groupby)
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hashes of the k-character shingles of a text (rolling,
    deterministic via blake2b-seeded multiplicative hashing)."""
    if len(text) < k:
        text = text + "\x00" * (k - len(text))
    n = len(text) - k + 1
    # vectorized byte-window hashing: polynomial rolling hash base 257
    b = np.frombuffer(text.encode("utf-8", "surrogatepass")[: n + k - 1 + 8], dtype=np.uint8)
    # byte windows stand in for char windows on multibyte text — only
    # consistency matters for shingling, not codepoint alignment
    n_b = len(b) - k + 1
    if n_b <= 0:
        return np.array([np.uint64(1)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n_b, dtype=np.uint64)
        for i in range(k):
            acc = acc * np.uint64(1099511628211) + b[i : i + n_b].astype(np.uint64)
    return np.unique(acc)


class MinHasher:
    """Stateful per-worker minhash: permutation parameters generated
    once (seeded), reused across batches (actor-pool friendly)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 1):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 61, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
        self.b = rng.randint(0, 1 << 61, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)  # (S,)
        with np.errstate(over="ignore"):
            # (S, P) universal hashing; min over shingles
            vals = sh[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def batch_signatures(self, texts: list[str | None]) -> np.ndarray:
        out = np.zeros((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            if t:
                out[i] = self.signature(t)
        return out


def minhash_signatures(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 128,
    shingle_k: int = 5,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    """id + minhash signature (fixed_size_list<uint64>) per row —
    actor-pool stage (permutations built once per actor)."""

    class Sig:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k)

        def __call__(self, t: pa.Table) -> pa.Table:
            sigs = self.mh.batch_signatures(t[text_col].to_pylist())
            return pa.table(
                {
                    id_col: t[id_col],
                    "sig": pa.FixedSizeListArray.from_arrays(
                        pa.array(sigs.reshape(-1), type=pa.uint64()), num_perm
                    ),
                }
            )

    return ds.map_batches(
        Sig, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )


def _sig_matrix(t: pa.Table, num_perm: int) -> np.ndarray:
    flat = t["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, num_perm).astype(np.uint64)


def minhash_dedup_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pa.Table:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    shingle → minhash (actor pool) → explode to one (band_hash, id, sig)
    row per band → groupby(band_hash-bucket) → verify INSIDE the group
    by signature agreement → deduped (id_a, id_b, jaccard_est) table."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(
        ds, text_col, id_col, num_perm=num_perm, shingle_k=shingle_k, concurrency=concurrency
    )

    def explode(t: pa.Table) -> pa.Table:
        m = _sig_matrix(t, num_perm)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(t)
        band_hashes = np.zeros((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bidx in range(bands):
                chunk = m[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
                acc = np.full(n, np.uint64(bidx * 1315423911 + 17), dtype=np.uint64)
                for j in range(rows_per_band):
                    acc = acc * np.uint64(0x9E3779B97F4A7C15) + chunk[:, j]
                band_hashes[:, bidx] = acc
        out_ids = np.repeat(ids, bands)
        out_bh = band_hashes.reshape(-1)
        out_sig = np.repeat(m, bands, axis=0)
        return pa.table(
            {
                "band_hash": pa.array(out_bh, type=pa.uint64()),
                "bucket": pa.array((out_bh % np.uint64(256)).astype(np.int32)),
                id_col: pa.array(out_ids),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(out_sig.reshape(-1), type=pa.uint64()), num_perm
                ),
            }
        )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        # group by band_hash inside the bucket; emit verified pairs
        order = pc.sort_indices(g, sort_keys=[("band_hash", "ascending")])
        g = g.take(order)
        bh = g["band_hash"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        m = _sig_matrix(g, num_perm)
        a_out, b_out, j_out = [], [], []
        start = 0
        for end in range(1, len(bh) + 1):
            if end == len(bh) or bh[end] != bh[start]:
                if end - start > 1:
                    grp = np.arange(start, end)
                    for x in range(len(grp)):
                        for y in range(x + 1, len(grp)):
                            ia, ib = grp[x], grp[y]
                            if ids[ia] == ids[ib]:
                                continue
                            est = float((m[ia] == m[ib]).mean())
                            if est >= threshold:
                                lo, hi = sorted((int(ids[ia]), int(ids[ib])))
                                a_out.append(lo)
                                b_out.append(hi)
                                j_out.append(est)
                start = end
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "jaccard_est": pa.array(j_out, type=pa.float64()),
            }
        )

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    t = pa.Table.from_pandas(pairs.to_pandas(), preserve_index=False)
    if len(t) == 0:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "jaccard_est": pa.array([], type=pa.float64()),
            }
        )
    # same pair can surface from multiple bands → keep max estimate
    agg = (
        t.group_by(["id_a", "id_b"], use_threads=False)
        .aggregate([("jaccard_est", "max")])
        .rename_columns(["id_a", "id_b", "jaccard_est"])
    )
    return agg.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def near_dup_groups(pairs: pa.Table) -> dict[int, int]:
    """Union-find over verified pairs (driver-side; pairs are tiny —
    see module docstring for the scale assumption). Returns
    id → group-representative (smallest id in the component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_batch(texts: list[str | None], ngram: int = 3) -> np.ndarray:
    """64-bit SimHash per text over character n-grams."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        h = _shingle_hashes(t, ngram)
        # accumulate bit votes
        votes = np.zeros(64, dtype=np.int64)
        for chunk_start in range(0, len(h), 4096):
            chunk = h[chunk_start : chunk_start + 4096]
            bitsmat = ((chunk[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
            votes += (2 * bitsmat - 1).sum(axis=0)
        pos = (votes > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(pos << bits)
    return out


def simhash_column(
    ds: "ray.data.Dataset", text_col: str, id_col: str, ngram: int = 3
) -> "ray.data.Dataset":
    def fn(t: pa.Table) -> pa.Table:
        sh = _simhash_batch(t[text_col].to_pylist(), ngram)
        return pa.table({id_col: t[id_col], "simhash": pa.array(sh, type=pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dedup_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    ngram: int = 3,
) -> pa.Table:
    """Pairs with Hamming(simhash) <= max_hamming via pigeonhole
    banding: split 64 bits into (max_hamming+1) chunks; any pair within
    distance shares at least one exact chunk → groupby(chunk, value)."""
    sh = simhash_column(ds, text_col, id_col, ngram)
    nchunks = max_hamming + 1
    width = 64 // nchunks

    def explode(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        outs = {"chunk": [], "value": [], id_col: [], "simhash": []}
        for c in range(nchunks):
            vals = (h >> np.uint64(c * width)) & np.uint64((1 << width) - 1)
            outs["chunk"].extend([c] * len(h))
            outs["value"].extend(vals.tolist())
            outs[id_col].extend(ids.tolist())
            outs["simhash"].extend(h.tolist())
        return pa.table(
            {
                "chunk": pa.array(outs["chunk"], type=pa.int32()),
                "value": pa.array(outs["value"], type=pa.uint64()),
                id_col: pa.array(outs[id_col], type=pa.int64()),
                "simhash": pa.array(outs["simhash"], type=pa.uint64()),
            }
        )

    def pairs_in_group(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        h = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        a_out, b_out, d_out = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if ids[x] == ids[y]:
                    continue
                d = int(bin(int(h[x]) ^ int(h[y])).count("1"))
                if d <= max_hamming:
                    lo, hi = sorted((int(ids[x]), int(ids[y])))
                    a_out.append(lo)
                    b_out.append(hi)
                    d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "hamming": pa.array(d_out, type=pa.int64()),
            }
        )

    pairs = (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby(["chunk", "value"])
        .map_groups(pairs_in_group, batch_format="pyarrow")
    )
    t = pa.Table.from_pandas(pairs.to_pandas(), preserve_index=False)
    if len(t) == 0:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
    agg = (
        t.group_by(["id_a", "id_b"], use_threads=False)
        .aggregate([("hamming", "min")])
        .rename_columns(["id_a", "id_b", "hamming"])
    )
    return agg.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (verification twin for the
    MinHash estimate — §5.3 exact/sketch duality)."""
    sa = set(a[i : i + k] for i in range(max(1, len(a) - k + 1)))
    sb = set(b[i : i + k] for i in range(max(1, len(b) - k + 1)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
