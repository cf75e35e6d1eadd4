"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k — the baseline. Query matrix is
  broadcast ONCE via ``ray.put``; each batch does one numpy matmul and
  emits only its local top-k per query; the global reduce merges
  (num_batches × k × num_queries) candidate rows, never the vectors.
- ``IvfIndex`` / ``knn_ivf``: the scale path — coarse k-means centroids
  (trained on a driver-side sample), batches prune to queries whose
  ``nprobe`` nearest cells intersect the batch's cells. Same
  merge; less matmul. Recall < 1 by design (documented), verified
  against the brute twin in tests (§5.3-style exact/approx duality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = [
    "embedding_matrix",
    "knn_brute",
    "IvfIndex",
    "knn_ivf",
    "embedding_signs",
    "embedding_dedup_pairs_ds",
    "embedding_dedup_pairs",
    "ivf_write_partitioned",
    "knn_ivf_partitioned",
    "random_project",
]


def embedding_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim).astype(np.float32)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    dtype=np.float32,
) -> pa.Table:
    """Exact cosine top-k of each query against every row.

    Returns (query_id, vec_id, score) sorted by (query_id, -score).
    The query matrix is put in the object store once and read
    zero-copy by every task — NOT re-shipped per batch. ``dtype``:
    float32 for speed, float64 when comparing against a double-precision
    oracle."""
    q = _normalize(np.asarray(queries, dtype=dtype))
    q_ref = ray.put(q)

    def local_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        emb = _normalize(embedding_matrix(t, embedding_col).astype(dtype))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        scores = emb @ qm.T  # (n, Q)
        kk = min(k, scores.shape[0])
        out_q, out_id, out_s = [], [], []
        # per-query local top-k via argpartition (vectorized per column)
        part = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (k, Q)
        for qi in range(scores.shape[1]):
            sel = part[:, qi]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_s.extend(scores[sel, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    t = pa.Table.from_pandas(cand.to_pandas(), preserve_index=False)
    if len(t) == 0:
        return t
    # global reduce: top-k per query over the candidate rows (small)
    df = t.to_pandas()
    df = (
        df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def embedding_signs(
    ds: "ray.data.Dataset",
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    num_bits: int = 64,
    seed: int = 11,
    keep_embedding: bool = True,
) -> "ray.data.Dataset":
    """Random-hyperplane signature per row (sign-LSH for cosine,
    Charikar SimHash family): ``num_bits`` sign bits of projections onto
    seeded Gaussian hyperplanes, packed into a uint64. Hamming distance
    on signatures estimates angular distance. Projection matrix is
    regenerated from the seed inside each task (cheap: d × 64 floats) —
    nothing is shipped."""
    assert num_bits <= 64

    def sign(t: pa.Table) -> pa.Table:
        emb = embedding_matrix(t, embedding_col)
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((emb.shape[1], num_bits)).astype(np.float32)
        bits = (emb @ planes) > 0  # (n, num_bits)
        weights = (np.uint64(1) << np.arange(num_bits, dtype=np.uint64))
        sig = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
        cols = {id_col: t[id_col], "sig": pa.array(sig, type=pa.uint64())}
        if keep_embedding:
            cols[embedding_col] = t[embedding_col]
        return pa.table(cols)

    return ds.map_batches(sign, batch_format="pyarrow", zero_copy_batch=True)


def embedding_dedup_pairs_ds(
    ds: "ray.data.Dataset",
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    max_hamming: int = 8,
    num_bits: int = 64,
    seed: int = 11,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold), as a
    distributed Dataset (id_a, id_b, cosine).

    sign-LSH signature → pigeonhole banding (split ``num_bits`` into
    ``max_hamming+1`` chunks: any pair within Hamming ``max_hamming``
    shares one exact chunk) → groupby(chunk, value) → EXACT cosine
    verification inside the group — LSH only prunes candidates, never
    decides. Recall misses pairs whose signatures differ in more than
    ``max_hamming`` bits (P[bit differs] = angle/π; at cosine 0.9 and 64
    bits, E[hamming] ≈ 9 — raise ``max_hamming`` or lower ``num_bits``
    chunking for stricter recall).

    Scale note (documented assumption): embeddings ride through the
    candidate shuffle (one copy per chunk, ``max_hamming+1`` ×
    dim × 4 bytes per row). For very wide embeddings prefer a two-phase
    plan (candidate ids first, then fetch)."""
    sigs = embedding_signs(
        ds,
        embedding_col=embedding_col,
        id_col=id_col,
        num_bits=num_bits,
        seed=seed,
    )
    nchunks = max_hamming + 1
    width = num_bits // nchunks

    def explode(t: pa.Table) -> pa.Table:
        h = t["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(t)
        chunks, values, idx = [], [], []
        for c in range(nchunks):
            vals = (h >> np.uint64(c * width)) & np.uint64((1 << width) - 1)
            chunks.append(np.full(n, c, dtype=np.int32))
            values.append(vals)
            idx.append(np.arange(n))
        take = pa.array(np.concatenate(idx), type=pa.int64())
        out = pa.table(
            {
                "chunk": pa.array(np.concatenate(chunks)),
                "value": pa.array(np.concatenate(values), type=pa.uint64()),
                id_col: t[id_col].take(take),
                embedding_col: t[embedding_col].take(take),
            }
        )
        return out

    def verify(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        emb = _normalize(embedding_matrix(g, embedding_col))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        sims = emb @ emb.T
        ia, ib = np.triu_indices(len(ids), k=1)
        hit = sims[ia, ib] >= threshold
        ia, ib = ia[hit], ib[hit]
        keep = ids[ia] != ids[ib]
        ia, ib = ia[keep], ib[keep]
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        return pa.table(
            {
                "id_a": pa.array(lo, type=pa.int64()),
                "id_b": pa.array(hi, type=pa.int64()),
                "cosine": pa.array(sims[ia, ib].astype(np.float64)),
            }
        )

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["chunk", "value"])
        .map_groups(verify, batch_format="pyarrow")
    )
    from .dedup import _dedup_pairs_ds

    return _dedup_pairs_ds(pairs, "cosine", "max")


def embedding_dedup_pairs(ds: "ray.data.Dataset", **kwargs) -> pa.Table:
    """Driver-sized wrapper around ``embedding_dedup_pairs_ds``."""
    from .dedup import _pairs_table

    return _pairs_table(embedding_dedup_pairs_ds(ds, **kwargs), "cosine", pa.float64())


def ivf_write_partitioned(
    ds: "ray.data.Dataset",
    index: "IvfIndex",
    out_dir: str,
    *,
    embedding_col: str = "embedding",
) -> None:
    """Materialize cell-partitioned inverted lists: each row is stamped
    with its nearest-centroid cell and written to
    ``out_dir/cell=<c>/...`` — the 100-TB IVF layout. Queries then READ
    ONLY their probed cells' directories (storage-level pruning), so
    search cost scales with nprobe/num_cells of the data, not its size."""
    cents_ref = ray.put(index.centroids)

    def stamp(t: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        emb = _normalize(embedding_matrix(t, embedding_col))
        cells = (emb @ cents.T).argmax(axis=1).astype(np.int32)
        return t.append_column("cell", pa.array(cells))

    ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["cell"]
    )


def knn_ivf_partitioned(
    out_dir: str,
    queries: np.ndarray,
    index: "IvfIndex",
    *,
    k: int = 10,
    nprobe: int = 4,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """ANN over a cell-partitioned layout (``ivf_write_partitioned``):
    reads ONLY the union of every query's ``nprobe`` nearest cells, then
    exact cosine within them. Same merge as ``knn_brute``."""
    import os

    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_cells = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    needed = sorted(set(int(c) for c in q_cells.reshape(-1)))
    import glob as globmod

    paths = []
    for c in needed:
        d = os.path.join(out_dir, f"cell={c}")
        if os.path.isdir(d):
            paths.extend(sorted(globmod.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    ds = ray.data.read_parquet(paths, columns=[id_col, embedding_col])
    return knn_brute(ds, q, k=k, embedding_col=embedding_col, id_col=id_col)


class IvfIndex:
    """Coarse quantizer for IVF search: k-means centroids trained on a
    sampled subset (driver-side numpy Lloyd iterations — the sample is
    small; the full data never leaves the cluster)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids.astype(np.float32))

    @classmethod
    def train(
        cls,
        ds: "ray.data.Dataset",
        *,
        num_cells: int = 16,
        embedding_col: str = "embedding",
        sample_frac: float = 0.1,
        iters: int = 10,
        seed: int = 7,
    ) -> "IvfIndex":
        sample = ds.random_sample(sample_frac, seed=seed)
        t = pa.Table.from_pandas(sample.to_pandas(), preserve_index=False)
        x = _normalize(embedding_matrix(t, embedding_col))
        rng = np.random.RandomState(seed)
        cent = x[rng.choice(len(x), size=min(num_cells, len(x)), replace=False)]
        for _ in range(iters):
            sim = x @ cent.T
            assign = sim.argmax(axis=1)
            for c in range(len(cent)):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
            cent = _normalize(cent)
        return cls(cent)

    def assign(self, emb: np.ndarray) -> np.ndarray:
        return (emb @ self.centroids.T).argmax(axis=1)


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    index: IvfIndex,
    *,
    k: int = 10,
    nprobe: int = 4,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate cosine top-k: each batch scores a query only against
    its rows that live in the query's ``nprobe`` closest cells."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_cells = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    q_ref = ray.put((q, q_cells, index.centroids))

    def local_topk(t: pa.Table) -> pa.Table:
        qm, qc, cents = ray.get(q_ref)
        emb = _normalize(embedding_matrix(t, embedding_col))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cells = (emb @ cents.T).argmax(axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cells, qc[qi])
            if not mask.any():
                continue
            sub = emb[mask]
            scores = sub @ qm[qi]
            kk = min(k, len(scores))
            sel = np.argpartition(-scores, kk - 1)[:kk]
            sub_ids = ids[mask]
            out_q.extend([qi] * kk)
            out_id.extend(sub_ids[sel].tolist())
            out_s.extend(scores[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    t = pa.Table.from_pandas(cand.to_pandas(), preserve_index=False)
    if len(t) == 0:
        return t
    df = t.to_pandas()
    df = (
        df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def random_project(
    ds: "ray.data.Dataset",
    emb_col: str,
    out_dim: int,
    *,
    seed: int = 42,
    out_col: str | None = None,
    normalize: bool = False,
) -> "ray.data.Dataset":
    """Gaussian random projection (Johnson-Lindenstrauss) of an
    embedding column to ``out_dim`` — the standard footprint/compute
    reducer in front of brute/IVF ANN and embedding dedup: at 100 TB,
    projecting 1024-d to 128-d cuts every downstream matmul, broadcast
    and shuffle byte 8x while preserving pairwise inner products to
    O(sqrt(log n / out_dim)) distortion (JL lemma).

    The projection matrix R (d_in x out_dim, N(0,1)/sqrt(out_dim)) is
    REGENERATED deterministically from ``seed`` + the input dim inside
    each task (one `np.random.default_rng` draw, microseconds at any
    realistic dim) instead of broadcast — zero driver state, identical
    across tasks/runs/cluster sizes by construction, resume-safe.
    Per batch: ONE matmul. ``normalize=True`` re-unit-norms the output
    rows (cosine users); rows with a NULL embedding are dropped
    (documented — a missing vector has no projection)."""
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    name = out_col or emb_col

    def _out_schema(in_schema: pa.Schema) -> pa.Schema:
        f = pa.field(name, pa.list_(pa.float32(), out_dim))
        if name in in_schema.names:
            return pa.schema(
                [f if fld.name == name else fld for fld in in_schema]
            )
        return pa.schema(list(in_schema) + [f])

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[emb_col]))
        if len(t) == 0:
            return _out_schema(t.schema).empty_table()
        m = embedding_matrix(t, emb_col)
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, m.shape[1], out_dim])
        )
        R = (rng.standard_normal((m.shape[1], out_dim)) / np.sqrt(out_dim)).astype(
            np.float32
        )
        p = np.ascontiguousarray(m @ R)
        if normalize:
            p = _normalize(p)
        # vectorized list column: one flat buffer, no per-row Python
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(p.ravel(), type=pa.float32()), out_dim
        )
        if name in t.schema.names:
            return t.set_column(t.schema.get_field_index(name), name, col)
        return t.append_column(name, col)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid, TPAMI 2011 — public
# method): m-subspace codebooks, uint8 codes, asymmetric-distance top-k
# ---------------------------------------------------------------------------


def pq_train(
    ds: "ray.data.Dataset",
    *,
    embedding_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Train PQ codebooks: split the vector into ``m`` contiguous
    subspaces and run k-means (``k`` centroids, Lloyd) independently in
    each — on a BOUNDED training sample (codebook quality needs a
    sample, not the corpus; same discipline as IvfIndex.train). Returns
    float32 codebooks of shape (m, k, dim/m)."""
    n_total = max(ds.count(), 1)
    sample = ds.random_sample(min(1.0, sample_rows / n_total), seed=seed)
    t = pa.Table.from_pandas(sample.to_pandas(), preserve_index=False)
    x = embedding_matrix(t, embedding_col).astype(np.float32)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(k, n)
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float32)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books[j] = cent
    return books


def pq_encode_ds(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> "ray.data.Dataset":
    """Encode every vector to ``m`` uint8 codes (nearest centroid per
    subspace) — dim×4 bytes → m bytes per row (32× at dim=64, m=8).
    Codebooks broadcast once via ``ray.put``; the per-batch argmin is
    one ‖x‖²−2x·c+‖c‖² matmul per subspace. Output keeps ``id_col``
    and emits ``code_col`` as fixed_size_list<uint8>[m] — the compact
    representation that ships/stores at 100 TB."""
    books_ref = ray.put(np.asarray(codebooks, dtype=np.float32))

    def encode(t: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        m, k, dsub = books.shape
        x = embedding_matrix(t, embedding_col).astype(np.float32)
        codes = np.empty((len(t), m), dtype=np.uint8)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            cn = (books[j] ** 2).sum(axis=1)  # (k,)
            d = cn[None, :] - 2.0 * (sub @ books[j].T)  # + ||x||² const
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: t[id_col],
                code_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), type=pa.uint8()), m
                ),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def pq_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    codebooks: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> pa.Table:
    """Approximate L2 top-k over PQ codes via ASYMMETRIC distance
    (ADC): per query one (m, k) lookup table of exact
    query-subvector→centroid squared distances; a row's distance is the
    sum of m uint8-indexed LUT gathers — no decode, no float vectors
    move. Per-batch local top-k partials + one small driver merge (the
    knn_brute reduce shape). Returns (query_id, vec_id, score) with
    score = −distance² (higher is better, like the cosine ops)."""
    books = np.asarray(codebooks, dtype=np.float32)
    m, kk_, dsub = books.shape
    q = np.asarray(queries, dtype=np.float32)
    # LUTs: (Q, m, k) exact subspace distances
    luts = np.empty((len(q), m, kk_), dtype=np.float32)
    for j in range(m):
        qs = q[:, j * dsub : (j + 1) * dsub]  # (Q, dsub)
        diff = qs[:, None, :] - books[j][None, :, :]
        luts[:, j, :] = (diff**2).sum(axis=2)
    luts_ref = ray.put(luts)

    def local_topk(t: pa.Table) -> pa.Table:
        lut = ray.get(luts_ref)
        codes = np.asarray(
            t[code_col].combine_chunks().flatten().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        ).reshape(len(t), m)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(lut.shape[0]):
            d = lut[qi, np.arange(m)[None, :], codes].sum(axis=1)  # (n,)
            sel = np.argpartition(d, min(k, len(d)) - 1)[: min(k, len(d))]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_s.extend((-d[sel]).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    t = pa.Table.from_pandas(cand.to_pandas(), preserve_index=False)
    if len(t) == 0:
        return t
    df = t.to_pandas()
    df = (
        df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)
