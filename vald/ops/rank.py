"""Grouped top-k / arg-max operators (SURVEY.md §2 B12 family).

Scalable shape: a per-batch PARTIAL top-k combiner (at most ``k`` rows
per group key survive each batch) runs before the shuffle, so the
``groupby(key)`` exchange moves O(k x n_batches) rows per group instead
of the whole group — the same partial-before-shuffle rule the engine
uses for aggregates (vald/pipeline.py) and sliding windows
(vald/ops/windows.py). The final per-group merge is a tiny
``map_groups`` sort over the surviving candidates.

Null policy (documented, matches the query-catalog oracles): rows whose
group key or order value is null are dropped before ranking — SQL
ROW_NUMBER() oracles add the matching ``IS NOT NULL`` guards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _topk_indices(
    codes: np.ndarray, order: np.ndarray, tiebreak: np.ndarray, k: int, descending: bool
) -> np.ndarray:
    """Vectorized per-group top-k over parallel arrays: lexsort by
    (group, order, tiebreak asc), then keep positions < k within each
    run of equal group codes. No Python loop over rows."""
    ord_key = -order if descending else order
    perm = np.lexsort((tiebreak, ord_key, codes))
    sorted_codes = codes[perm]
    # position within each run of equal codes
    change = np.empty(len(sorted_codes), dtype=bool)
    if len(sorted_codes):
        change[0] = True
        change[1:] = sorted_codes[1:] != sorted_codes[:-1]
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    pos = np.arange(len(sorted_codes)) - starts[run_id]
    return perm[pos < k]


def grouped_topk(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    tiebreak: str,
    k: int,
    descending: bool = True,
    rank_col: str = "rn",
) -> "ray.data.Dataset":
    """Top-k rows per ``key`` ordered by ``order_col`` (then ``tiebreak``
    ascending), with a 1-based dense ``rank_col`` — the distributed twin
    of ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_col
    [DESC], tiebreak)``... ``WHERE rn <= k``."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        mask = pc.and_(pc.is_valid(t[key]), pc.is_valid(t[order_col]))
        t = t.filter(mask)
        if len(t) == 0:
            return t
        codes = pc.dictionary_encode(t[key].combine_chunks()).indices.to_numpy(
            zero_copy_only=False
        )
        order = t[order_col].to_numpy(zero_copy_only=False)
        tb = t[tiebreak].to_numpy(zero_copy_only=False)
        keep = np.sort(_topk_indices(codes, order, tb, k, descending))
        return t.take(pa.array(keep))

    def merge(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [
                (order_col, "descending" if descending else "ascending"),
                (tiebreak, "ascending"),
            ]
        )
        g = g.slice(0, k)
        return g.append_column(
            rank_col, pa.array(np.arange(1, len(g) + 1), type=pa.int64())
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .map_groups(merge, batch_format="pyarrow")
    )
