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

import ray.data

__all__ = ["read_source", "jsonl_documents"]

_FORMATS = ("parquet", "jsonl", "csv")


def read_source(
    paths: str | list[str],
    *,
    format: str = "parquet",
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Read ``paths`` in the given format as a Dataset of Arrow batches.

    - parquet: storage-level column pruning via ``columns=``.
    - jsonl / csv: full-row decode (inherent to the format), then an
      immediately-fused ``select_columns`` so only the requested
      columns enter the object store.
    """
    if format not in _FORMATS:
        raise ValueError(f"unknown source format {format!r}; one of {_FORMATS}")
    if format == "parquet":
        return ray.data.read_parquet(paths, columns=columns)
    if format == "jsonl":
        ds = ray.data.read_json(paths)
    else:
        ds = ray.data.read_csv(paths)
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
