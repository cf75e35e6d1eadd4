"""Distributed embedding clustering and semantic deduplication.

- ``kmeans_fit_ds``: spherical k-means trained on the FULL dataset —
  each Lloyd iteration is one streaming pass: centroids broadcast once
  via ``ray.put``, each batch emits at most k partial rows
  ``(cluster, cnt, vsum)``, a distributed ``groupby(cluster)`` combine
  reduces them, and the driver pulls only the k × dim centroid table.
  No pass materializes the data; per-iteration driver traffic is
  O(k · dim), independent of corpus size. (``similarity.IvfIndex.train``
  remains the cheap sampled variant; this op is the exact full-data
  twin for when centroid quality matters.)
- ``kmeans_assign_ds``: stamp each row with its nearest centroid and
  the cosine to it — embarrassingly parallel, one matmul per batch.
- ``semdedup_ds``: SemDeDup (Abbas et al., arXiv:2303.09540 —
  "SemDeDup: Data-efficient learning at web-scale through semantic
  deduplication"): cluster the embeddings, then within each cluster
  greedily keep only items whose cosine to every already-kept item is
  below ``threshold``, scanning in ascending centroid-similarity order
  (the paper's keep-the-least-typical rule). Per-cluster work is
  quadratic in cluster size, so k must scale with n (n/k docs per
  cluster is the unit of quadratic work); clusters above ``group_cap``
  are subdivided by an id hash into sub-cells (documented recall
  valve, same discipline as dedup's band-group cap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _normalize, embedding_matrix

__all__ = ["kmeans_fit_ds", "kmeans_assign_ds", "semdedup_ds"]

_GROUP_CAP = 8192


def _vsum_table(cluster: np.ndarray, cnt: np.ndarray, sums: np.ndarray) -> pa.Table:
    dim = sums.shape[1]
    flat = pa.array(sums.astype(np.float64).ravel(), type=pa.float64())
    return pa.table(
        {
            "cluster": pa.array(cluster.astype(np.int32)),
            "cnt": pa.array(cnt.astype(np.int64)),
            "vsum": pa.FixedSizeListArray.from_arrays(flat, dim),
        }
    )


def kmeans_fit_ds(
    ds: "ray.data.Dataset",
    *,
    k: int = 16,
    embedding_col: str = "embedding",
    iters: int = 10,
    seed: int = 7,
    init: np.ndarray | None = None,
    init_sample: int | None = None,
    tol: float = 1e-6,
) -> np.ndarray:
    """Fit spherical k-means over the full dataset; returns the
    (k, dim) unit-norm centroid matrix.

    Init is a deterministic bounded prefix sample (``init_sample``
    rows, default 64·k) unless ``init`` provides explicit centroids
    (the parity tests do, to pin semantics against a driver-side
    reference). Empty clusters keep their previous centroid. Stops
    early when every centroid moves by less than ``tol`` in cosine."""
    if init is not None:
        cent = _normalize(np.asarray(init, dtype=np.float64))
        k = len(cent)
    else:
        n_init = max(init_sample or 64 * k, k)
        head = pa.Table.from_pandas(
            ds.limit(n_init).to_pandas(), preserve_index=False
        )
        x = _normalize(embedding_matrix(head, embedding_col)).astype(np.float64)
        if len(x) < k:
            raise ValueError(f"kmeans_fit_ds: need >= k={k} rows, got {len(x)}")
        rng = np.random.RandomState(seed)
        cent = x[rng.choice(len(x), size=k, replace=False)].copy()

    dim = cent.shape[1]

    for _ in range(iters):
        cents_ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            emb = _normalize(embedding_matrix(t, embedding_col)).astype(np.float64)
            if len(emb) == 0:
                return _vsum_table(
                    np.array([], np.int32),
                    np.array([], np.int64),
                    np.zeros((0, dim)),
                )
            c = ray.get(cents_ref)
            assign = (emb @ c.T).argmax(axis=1)
            uniq, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(uniq), dim), dtype=np.float64)
            np.add.at(sums, inv, emb)
            cnt = np.bincount(inv, minlength=len(uniq))
            return _vsum_table(uniq, cnt, sums)

        def combine(g: pa.Table) -> pa.Table:
            m = (
                g["vsum"]
                .combine_chunks()
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(len(g), dim)
            )
            c = int(g["cluster"][0].as_py())
            return _vsum_table(
                np.array([c], np.int32),
                np.array([int(np.sum(g["cnt"].to_numpy()))], np.int64),
                m.sum(axis=0, keepdims=True),
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("cluster")
            .map_groups(combine, batch_format="pyarrow")
            .to_pandas()
        )
        new_cent = cent.copy()
        for row in agg.itertuples():
            if row.cnt > 0:
                new_cent[int(row.cluster)] = np.asarray(row.vsum, dtype=np.float64)
        new_cent = _normalize(new_cent)
        shift = 1.0 - np.sum(new_cent * cent, axis=1).min()
        cent = new_cent
        if shift < tol:
            break
    return cent.astype(np.float32)


def kmeans_assign_ds(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    *,
    embedding_col: str = "embedding",
    cluster_col: str = "cluster",
    sim_col: str = "centroid_sim",
) -> "ray.data.Dataset":
    """Stamp each row with its nearest centroid (cosine) and the
    similarity to it. Centroids broadcast ONCE via ``ray.put``."""
    cents = _normalize(np.asarray(centroids, dtype=np.float32))
    cents_ref = ray.put(cents)

    def stamp(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        emb = _normalize(embedding_matrix(t, embedding_col))
        sims = emb @ c.T
        assign = sims.argmax(axis=1).astype(np.int32)
        best = sims[np.arange(len(emb)), assign].astype(np.float64)
        t = t.append_column(cluster_col, pa.array(assign))
        return t.append_column(sim_col, pa.array(best))

    return ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)


def semdedup_ds(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.95,
    k: int = 16,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    iters: int = 10,
    seed: int = 7,
    group_cap: int = _GROUP_CAP,
    keep_cluster: bool = False,
) -> "ray.data.Dataset":
    """SemDeDup semantic dedup: returns the SURVIVING rows (original
    columns, plus ``cluster``/``centroid_sim`` when ``keep_cluster``).

    Within each k-means cluster, scan members in ascending
    centroid-similarity order (ties by id) and keep a member only if
    its cosine to every already-kept member is < ``threshold`` — i.e.
    each semantic-duplicate group survives through its least-typical
    exemplar, per the paper. The scan is an O(g) loop of vectorized
    kept-row max-sims over one precomputed g×g matmul. Clusters larger
    than ``group_cap`` are hash-split into ceil(g/cap) sub-cells first
    (duplicates straddling sub-cells are missed — the same documented
    recall valve as the LSH band cap; size k so n/k stays under cap)."""
    if centroids is None:
        centroids = kmeans_fit_ds(
            ds, k=k, embedding_col=embedding_col, iters=iters, seed=seed
        )
    stamped = kmeans_assign_ds(ds, centroids, embedding_col=embedding_col)
    drop_cols = [] if keep_cluster else ["cluster", "centroid_sim"]

    def dedup_group(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return g.drop_columns(["__sub", *drop_cols])
        if n == 1:
            return g.drop_columns(["__sub", *drop_cols])
        emb = _normalize(embedding_matrix(g, embedding_col)).astype(np.float64)
        sim_c = g["centroid_sim"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sim_c))  # ascending centroid_sim, tie id
        sims = emb @ emb.T
        kept: list[int] = []
        keep_mask = np.zeros(n, dtype=bool)
        for i in order:
            if not kept or sims[i, kept].max() < threshold:
                kept.append(int(i))
                keep_mask[i] = True
        return g.filter(pa.array(keep_mask)).drop_columns(["__sub", *drop_cols])

    # Sub-cell key: clusters at or under group_cap keep one cell
    # (sub = cluster<<16); clusters over it are split by an 8-bit id
    # hash into ≤256 sub-cells (the recall valve — see docstring). The
    # size probe is a tiny k-row groupby, only run when a cap is set.
    if group_cap is not None and group_cap > 0:
        sizes = stamped.groupby("cluster").count().to_pandas()
        hot_arr = (
            sizes.loc[sizes["count()"] > group_cap, "cluster"]
            .astype(np.int64)
            .to_numpy()
        )
    else:
        hot_arr = np.array([], dtype=np.int64)

    def stamp_sub(t: pa.Table) -> pa.Table:
        cl = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = cl << 16
        if len(hot_arr):
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ((ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)).astype(
                np.int64
            )
            sub = np.where(np.isin(cl, hot_arr), sub | h, sub)
        return t.append_column("__sub", pa.array(sub))

    return (
        stamped.map_batches(stamp_sub, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__sub")
        .map_groups(dedup_group, batch_format="pyarrow")
    )
