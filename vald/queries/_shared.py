"""Shared catalog-query helpers: pruned parquet read, typed-empty
schema coercion, segment-filtered customer-key Dataset."""

from __future__ import annotations

import pyarrow as pa

import ray.data



def _read(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    filter=None,
) -> "ray.data.Dataset":
    """Pruned parquet read: ``columns=`` prunes at the storage layer;
    ``filter=`` (a pyarrow.dataset.Expression) pushes the predicate into
    the fragment scanner, so row-group statistics skip IO entirely on
    selective sorted/partitioned columns (B1 predicate pushdown)."""
    kwargs = {} if filter is None else {"filter": filter}
    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, **kwargs
    )



def _empty(schema: pa.Schema) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], type=f.type) for f in schema], schema=schema
    )



def _ensure_schema(ds: "ray.data.Dataset", schema: pa.Schema) -> pa.Table:
    """Collect a (small) result; return an empty typed table when the
    pipeline produced zero rows, so empty results still schema-match."""
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    if len(t) == 0:
        return _empty(schema)
    return t.select(schema.names).cast(schema)



def _mkt_keys_ds(sf_dir: str, segment: str) -> "ray.data.Dataset":
    """Segment-filtered customer keys as a pruned Dataset — feeds
    runtime.broadcast_or_semijoin, which decides broadcast vs join."""
    import pyarrow.dataset as pads

    return _read(
        sf_dir,
        "customer",
        ["c_custkey"],
        filter=pads.field("c_mktsegment") == segment,
    )
