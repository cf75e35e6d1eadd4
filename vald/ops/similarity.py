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

import ray
import ray.data

__all__ = ["embedding_matrix", "knn_brute", "IvfIndex", "knn_ivf"]


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
