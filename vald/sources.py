"""Input sources beyond Parquet (B1 breadth): JSONL and CSV readers
with the same column-pruning discipline where the format allows it.

Parquet stays the scale format (columnar, prunable, row-group
filterable); JSONL is the native interchange format of the reference's
world (per-line JSON documents), CSV the lowest common denominator.
Both decode whole rows (row-oriented formats cannot prune at the
storage layer), so ``columns=`` prunes right after decode — the batch
that leaves the read stage carries only what the pipeline needs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads

import ray.data

__all__ = ["read_source", "jsonl_documents", "build_filter"]

_FORMATS = ("parquet", "jsonl", "csv")

_OPS = {
    "==": lambda f, v: f == v,
    "!=": lambda f, v: f != v,
    "<": lambda f, v: f < v,
    "<=": lambda f, v: f <= v,
    ">": lambda f, v: f > v,
    ">=": lambda f, v: f >= v,
    "in": lambda f, v: f.isin(v),
    "not_in": lambda f, v: ~f.isin(v),
    "is_null": lambda f, v: f.is_null(),
    "not_null": lambda f, v: ~f.is_null(),
}


def build_filter(spec) -> "pads.Expression":
    """Declarative filter spec → pyarrow dataset Expression, so a
    TableSpec / CLI / JSON config can express a pushdown predicate
    without importing pyarrow (B1 predicate pushdown surface).

    Grammar: ``{"col": name, "op": one-of ==,!=,<,<=,>,>=,in,not_in,
    is_null,not_null, "value": v}`` | ``{"and": [specs]}`` |
    ``{"or": [specs]}`` | ``{"not": spec}``. A ready-made
    ``pads.Expression`` passes through unchanged."""
    if isinstance(spec, pads.Expression):
        return spec
    if not isinstance(spec, dict):
        raise ValueError(f"filter spec must be a dict or Expression, got {type(spec)}")
    if "and" in spec:
        parts = [build_filter(s) for s in spec["and"]]
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out
    if "or" in spec:
        parts = [build_filter(s) for s in spec["or"]]
        out = parts[0]
        for p in parts[1:]:
            out = out | p
        return out
    if "not" in spec:
        return ~build_filter(spec["not"])
    op = spec["op"]
    if op not in _OPS:
        raise ValueError(f"unknown filter op {op!r}; one of {sorted(_OPS)}")
    return _OPS[op](pads.field(spec["col"]), spec.get("value"))


def read_source(
    paths: str | list[str],
    *,
    format: str = "parquet",
    columns: list[str] | None = None,
    filter=None,
) -> "ray.data.Dataset":
    """Read ``paths`` in the given format as a Dataset of Arrow batches.

    - parquet: storage-level column pruning via ``columns=`` AND
      predicate pushdown via ``filter=`` (an Expression or
      ``build_filter`` spec) — row-group statistics skip IO before
      decode.
    - jsonl / csv: full-row decode (inherent to the format), then an
      immediately-fused filter + ``select_columns`` so only matching
      rows / requested columns enter the object store. Same semantics,
      applied post-decode (these formats carry no row statistics).
    """
    if format not in _FORMATS:
        raise ValueError(f"unknown source format {format!r}; one of {_FORMATS}")
    expr = None if filter is None else build_filter(filter)
    if format == "parquet":
        kwargs = {} if expr is None else {"filter": expr}
        return ray.data.read_parquet(paths, columns=columns, **kwargs)
    if format == "jsonl":
        ds = ray.data.read_json(paths)
    else:
        ds = ray.data.read_csv(paths)
    if expr is not None:
        ds = ds.map_batches(
            lambda t, e=expr: t.filter(e),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if columns:
        ds = ds.select_columns(columns)
    return ds


def jsonl_documents(
    paths: str | list[str],
    *,
    doc_column: str = "doc",
) -> "ray.data.Dataset":
    """Read JSONL files as ONE raw-JSON-string column per line —
    the per-document shape of the reference's ``validate(doc)`` world.
    Feed the column to a ``jsonSchema`` check (vald.kernels) for full
    recursive draft-03 validation per line.

    Implemented with ``read_text`` (each line is one row) so documents
    keep their exact raw bytes — no parse/re-serialize roundtrip — and
    malformed lines surface as validation failures, not read errors.
    """
    ds = ray.data.read_text(paths)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([doc_column])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
