"""Deterministic sampling operators (SURVEY.md §2 B13).

``hash_sample`` keeps a row iff Knuth's multiplicative hash of an
integer key lands below ``frac`` of the 32-bit space — deterministic
(no seed state to ship), stable under repartitioning, and exactly
reproducible in SQL (``(key * 2654435761) % 4294967296 < frac * 2**32``),
so unlike ``Dataset.random_sample`` it is DuckDB-oracle-checkable.
Stratification falls out for free: the same key always makes the same
cut, so joins between two hash-sampled tables on the key stay aligned.

Domain note (documented, not a silent cap): the multiply is exact in
int64 for keys < 2**33; beyond that, callers must pre-fold the key
(e.g. ``key % 2**32``) on BOTH sides. Testdata ids are far below the
bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_KNUTH = 2654435761
_M32 = 1 << 32


def hash_sample(
    ds: "ray.data.Dataset", key: str, frac: float
) -> "ray.data.Dataset":
    """Keep rows where hash(key) < frac of the 32-bit space. Null keys
    are dropped (SQL comparison with NULL is never true — same policy)."""
    threshold = int(frac * _M32)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[key]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        # fill nulls BEFORE to_numpy: a null int64 column converts to
        # float64 + NaN, and NaN->int64 casts are undefined
        k = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * _KNUTH) % _M32
        return t.filter(pa.array(valid & (h < threshold)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    key: str,
    n: int,
) -> "ray.data.Dataset":
    """Deterministic fixed-``n``-per-group sample (balanced subsampling
    for curation): keep the ``n`` rows whose Knuth hash of ``key`` is
    smallest within each ``group_col`` value. Seedless and
    repartition-stable like ``hash_sample``; the SQL twin is
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    (key*2654435761)%2**32, key) <= n``.

    Built on ``ops.rank.grouped_topk`` (per-batch partial top-k
    combiner before the shuffle), so the exchange moves at most
    ``n × groups`` rows per batch. Same int64-domain note as
    ``hash_sample``; NULL keys/groups are dropped."""
    import pyarrow.compute as pc

    from .rank import grouped_topk

    def stamp(t: pa.Table) -> pa.Table:
        col = t[key]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        k = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * _KNUTH) % _M32
        return t.filter(pa.array(valid)).append_column(
            "__h", pa.array(h[valid], type=pa.int64())
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(stamped, group_col, "__h", key, n, descending=False)
    return out.drop_columns(["__h", "rn"])
