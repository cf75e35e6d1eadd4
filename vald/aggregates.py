"""Profile aggregation (SURVEY.md B6): per-(partition, column) stats —
null counts, min/max/mean, HLL distinct, t-digest quantiles — computed
as partial sketches per batch and merged in a tiny groupby, so the
all-to-all exchange moves one sketch row per (block × column), never
the data.

Two surfaces:

- ``HllDistinct`` / ``TDigestQuantile`` — ``AggregateFnV2`` subclasses
  usable directly in ``ds.aggregate(...)`` / ``groupby().aggregate(...)``
  (accumulators are serialized sketch bytes; combine = sketch merge —
  commutative + associative, so results are parallelism-invariant).
- ``profile(ds, columns, ...)`` — the engine's profile operator:
  map_batches partials → groupby(partition_id, column) merge →
  one profile row per (partition, column).

Exact twins (§5.3): ``mode="exact"`` computes n_distinct via a real
distinct shuffle and quantiles via sort — used by DuckDB-oracle
queries; sketch mode is for scale. Never oracle-compare a sketch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from .sketches import HLL, TDigest, hash64_values

__all__ = ["HllDistinct", "TDigestQuantile", "profile", "PROFILE_SCHEMA"]


def _arrow_col(block: Block, name: str) -> pa.ChunkedArray:
    acc = BlockAccessor.for_block(block)
    return acc.to_arrow()[name]


class HllDistinct(AggregateFnV2):
    """Approximate COUNT(DISTINCT col) via HyperLogLog (p=14, ~1.3%).

    Accumulator = serialized register array (bytes), so it flows
    through Ray's aggregate machinery like any other value."""

    def __init__(self, on: str, alias_name: Optional[str] = None, p: int = 14):
        self._p = p
        super().__init__(
            alias_name if alias_name else f"hll_distinct({on})",
            on=on,
            ignore_nulls=True,
            zero_factory=lambda: HLL(p).serialize(),
        )

    def aggregate_block(self, block: Block):
        col = _arrow_col(block, self._target_col_name)
        col = col.drop_null()
        if len(col) == 0:
            return HLL(self._p).serialize()
        vals = col.to_numpy(zero_copy_only=False)
        return HLL(self._p).update_hashes(hash64_values(vals)).serialize()

    def combine(self, a: bytes, b: bytes) -> bytes:
        return HLL.deserialize(a).merge(HLL.deserialize(b)).serialize()

    def finalize(self, acc: bytes) -> int:
        return int(round(HLL.deserialize(acc).estimate()))


class TDigestQuantile(AggregateFnV2):
    """Approximate quantile via merging t-digest (δ=200)."""

    def __init__(
        self,
        on: str,
        q: float = 0.5,
        alias_name: Optional[str] = None,
        compression: float = 200.0,
    ):
        self._q = q
        self._compression = compression
        super().__init__(
            alias_name if alias_name else f"tdigest_q{q}({on})",
            on=on,
            ignore_nulls=True,
            zero_factory=lambda: TDigest(compression).serialize(),
        )

    def aggregate_block(self, block: Block):
        col = _arrow_col(block, self._target_col_name).drop_null()
        td = TDigest(self._compression)
        if len(col):
            td.update(col.to_numpy(zero_copy_only=False).astype(np.float64))
        return td.serialize()

    def combine(self, a: bytes, b: bytes) -> bytes:
        return TDigest.deserialize(a).merge(TDigest.deserialize(b)).serialize()

    def finalize(self, acc: bytes) -> float:
        return TDigest.deserialize(acc).quantile(self._q)


# ---------------------------------------------------------------------------
# profile operator
# ---------------------------------------------------------------------------

PROFILE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("column", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("mean", pa.float64()),
        ("p50", pa.float64()),
        ("p90", pa.float64()),
        ("p99", pa.float64()),
        ("tdigest", pa.binary()),
        ("hll", pa.binary()),
    ]
)

_PARTIAL_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("column", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("sum", pa.float64()),
        ("tdigest", pa.binary()),
        ("hll", pa.binary()),
    ]
)


def _numeric_view(col: pa.ChunkedArray) -> np.ndarray | None:
    """Float view of a column for stats: numeric → values; string/binary
    → utf8 length; list → list length; timestamp → epoch micros."""
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return col.to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_boolean(t):
        return col.cast(pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pc.binary_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return pc.list_value_length(col).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_timestamp(t):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    return None


class _ProfilePartial:
    """Actor-pool callable: one partial sketch row per (partition,
    column) per batch. Stats on numeric view; HLL on raw values."""

    def __init__(self, columns: list[str], partition_col: str | None, num_partitions: int):
        self.columns = columns
        self.partition_col = partition_col
        self.P = num_partitions

    def __call__(self, t: pa.Table) -> pa.Table:
        from . import hashing

        if len(t) == 0:
            return _PARTIAL_SCHEMA.empty_table()
        if self.partition_col:
            pids = hashing.partition_ids(t[self.partition_col], self.P)
        else:
            pids = np.zeros(len(t), dtype=np.int32)
        rows = {name: [] for name in _PARTIAL_SCHEMA.names}
        for pid in np.unique(pids):
            sel = pids == pid
            sub = t.filter(pa.array(sel))
            for c in self.columns:
                col = sub[c]
                nv = _numeric_view(col)
                n = len(col)
                if nv is not None:
                    # Arrow nulls surface as NaN in the float view, so
                    # NaN-count = nulls + genuine NaNs (both "null" per
                    # the NaN policy, vald.kernels docstring)
                    n_null = int(np.isnan(nv).sum())
                    vals = nv[~np.isnan(nv)]
                else:
                    n_null = col.null_count
                    vals = np.empty(0)
                td = TDigest().update(vals)
                hll = HLL()
                ct = col.type
                hashable = not (
                    pa.types.is_list(ct)
                    or pa.types.is_large_list(ct)
                    or pa.types.is_fixed_size_list(ct)
                    or pa.types.is_struct(ct)
                    or pa.types.is_map(ct)
                )
                if hashable:
                    nonnull = col.drop_null()
                    if len(nonnull):
                        hll.update_hashes(
                            hash64_values(nonnull.to_numpy(zero_copy_only=False))
                        )
                rows["partition_id"].append(int(pid))
                rows["column"].append(c)
                rows["n"].append(n)
                rows["n_null"].append(n_null)
                rows["min"].append(float(vals.min()) if len(vals) else float("nan"))
                rows["max"].append(float(vals.max()) if len(vals) else float("nan"))
                rows["sum"].append(float(vals.sum()) if len(vals) else 0.0)
                rows["tdigest"].append(td.serialize())
                rows["hll"].append(hll.serialize())
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], type=f.type) for f in _PARTIAL_SCHEMA],
            schema=_PARTIAL_SCHEMA,
        )


def _merge_group(g: pa.Table) -> pa.Table:
    n = int(pc.sum(g["n"]).as_py() or 0)
    n_null = int(pc.sum(g["n_null"]).as_py() or 0)
    mins = [v for v in g["min"].to_pylist() if v is not None and not np.isnan(v)]
    maxs = [v for v in g["max"].to_pylist() if v is not None and not np.isnan(v)]
    total = float(pc.sum(g["sum"]).as_py() or 0.0)
    td = TDigest()
    hll = HLL()
    for b in g["tdigest"].to_pylist():
        td.merge(TDigest.deserialize(b))
    for b in g["hll"].to_pylist():
        hll.merge(HLL.deserialize(b))
    n_valid = n - n_null
    row = {
        "partition_id": [g["partition_id"][0].as_py()],
        "column": [g["column"][0].as_py()],
        "n": [n],
        "n_null": [n_null],
        "n_distinct": [int(round(hll.estimate()))],
        "min": [min(mins) if mins else float("nan")],
        "max": [max(maxs) if maxs else float("nan")],
        "mean": [total / n_valid if n_valid else float("nan")],
        "p50": [td.quantile(0.5)],
        "p90": [td.quantile(0.9)],
        "p99": [td.quantile(0.99)],
        "tdigest": [td.serialize()],
        "hll": [hll.serialize()],
    }
    return pa.Table.from_arrays(
        [pa.array(row[f.name], type=f.type) for f in PROFILE_SCHEMA],
        schema=PROFILE_SCHEMA,
    )


def profile(
    ds: "ray.data.Dataset",
    columns: list[str],
    *,
    partition_col: str | None = None,
    num_partitions: int = 8,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    """B6: one profile row per (partition, column). Sketch mode —
    HLL distinct + t-digest quantiles; exact stats (n, null, min, max,
    mean) are exact regardless. The shuffle moves only sketch rows."""
    partials = ds.map_batches(
        _ProfilePartial,
        fn_constructor_kwargs={
            "columns": columns,
            "partition_col": partition_col,
            "num_partitions": num_partitions,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return partials.groupby(["partition_id", "column"]).map_groups(
        _merge_group, batch_format="pyarrow"
    )
