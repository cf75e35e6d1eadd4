"""Constraint inference: profile a Dataset, emit a suggested table spec.

The reverse arrow of the validation engine (SURVEY §2.B B6/B17): instead
of *checking* a declarative spec, OBSERVE one from the data — the shape
Great-Expectations-style profilers give an operator bootstrapping
validation over an unknown 100-TB corpus. The inferred dict is exactly
the shape ``vald.ir.compile_table_spec`` accepts, so

    spec = infer_table_spec(ds, "orders")
    results = pipeline.validate(ds2, ir.compile_table_spec(spec))

turns yesterday's corpus into today's contract.

Execution shape (scale notes):

- ONE stateless ``map_batches`` pass emits one compact partial row per
  (column, batch): exact n / n_null, numeric min/max, string
  code-point-length min/max, and a **capped distinct-value sample** —
  the enum candidate set is kept only while it holds ≤ ``max_enum + 1``
  values, so a high-cardinality column ships a one-row tombstone, never
  its values. Partials are O(columns) per batch regardless of row count.
- The merge is a single small ``groupby("column")`` over those partials
  (#columns × #batches rows — trivially bounded); the driver pulls one
  row per column. No full-data shuffle exists anywhere.
- NaN policy matches the kernels (vald.kernels docstring): a float NaN
  counts as null, so ``required`` is inferred only when the column has
  neither Arrow nulls nor NaNs — the inferred spec can never flag the
  corpus it was inferred from.

Self-consistency guarantee (pinned by a metamorphic test): validating
the profiled dataset against its own inferred spec yields ZERO
violations — observed bounds are closed intervals, the enum is the full
distinct set (never a sample), lengths are code-point lengths exactly as
``k_min_length`` counts them, and ``required``/``enum`` are only emitted
when provably satisfied.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["infer_report", "infer_table_spec", "diff_specs"]

# Arrow dtype -> spec "type" category accepted by kernels.k_type
def _type_category(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "number"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "array"
    if pa.types.is_struct(t):
        return "object"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return "any"


_PARTIAL_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("num_min", pa.float64()),  # NaN = no numeric value seen
        ("num_max", pa.float64()),
        ("len_min", pa.int64()),  # -1 = not a string column / none seen
        ("len_max", pa.int64()),
        # capped distinct sample; NULL (not empty) = overflowed the cap
        ("enum_vals", pa.list_(pa.string())),
    ]
)


class _InferPartial:
    """Stateless per-batch partial. Plain function semantics (no heavy
    state), but kept as a callable class so the column list and cap ride
    the constructor, mirroring the actor-pool convention."""

    def __init__(self, columns: list[str], max_enum: int):
        self.columns = columns
        self.cap = max_enum + 1  # keep one extra so overflow is provable

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {name: [] for name in _PARTIAL_SCHEMA.names}
        for c in self.columns:
            col = t[c]
            ct = col.type
            n = len(col)
            num_min = num_max = float("nan")
            len_min = len_max = -1
            enum_vals: list[str] | None = None
            if pa.types.is_floating(ct):
                v = col.to_numpy(zero_copy_only=False).astype(np.float64)
                nan = np.isnan(v)
                n_null = int(nan.sum())  # Arrow null + NaN, kernel NaN policy
                vals = v[~nan]
                if len(vals):
                    num_min, num_max = float(vals.min()), float(vals.max())
            elif pa.types.is_integer(ct):
                n_null = col.null_count
                nonnull = col.drop_null()
                if len(nonnull):
                    num_min = float(pc.min(nonnull).as_py())
                    num_max = float(pc.max(nonnull).as_py())
            elif pa.types.is_string(ct) or pa.types.is_large_string(ct):
                n_null = col.null_count
                nonnull = col.drop_null()
                if len(nonnull):
                    lens = pc.utf8_length(nonnull)  # code points = k_*Length
                    len_min = int(pc.min(lens).as_py())
                    len_max = int(pc.max(lens).as_py())
                    uniq = pc.unique(nonnull)
                    if len(uniq) <= self.cap:
                        enum_vals = uniq.to_pylist()
                else:
                    enum_vals = []
            else:
                n_null = col.null_count
            rows["column"].append(c)
            rows["n"].append(n)
            rows["n_null"].append(n_null)
            rows["num_min"].append(num_min)
            rows["num_max"].append(num_max)
            rows["len_min"].append(len_min)
            rows["len_max"].append(len_max)
            rows["enum_vals"].append(enum_vals)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], type=f.type) for f in _PARTIAL_SCHEMA],
            schema=_PARTIAL_SCHEMA,
        )


def _merge_column(g: pa.Table) -> pa.Table:
    cap = int(g["cap"][0].as_py())
    name = g["column"][0].as_py()
    n = int(pc.sum(g["n"]).as_py() or 0)
    n_null = int(pc.sum(g["n_null"]).as_py() or 0)
    mins = g["num_min"].to_numpy(zero_copy_only=False)
    maxs = g["num_max"].to_numpy(zero_copy_only=False)
    have = ~np.isnan(mins)
    num_min = float(mins[have].min()) if have.any() else float("nan")
    num_max = float(maxs[~np.isnan(maxs)].max()) if have.any() else float("nan")
    lmin = g["len_min"].to_numpy(zero_copy_only=False)
    lmax = g["len_max"].to_numpy(zero_copy_only=False)
    seen = lmin >= 0
    len_min = int(lmin[seen].min()) if seen.any() else -1
    len_max = int(lmax[seen].max()) if seen.any() else -1
    # enum union: any NULL partial = some batch overflowed -> overflow
    enum_col = g["enum_vals"]
    if enum_col.null_count > 0:
        enum_vals = None
    else:
        flat = pc.list_flatten(enum_col.combine_chunks())
        uniq = pc.unique(flat)
        enum_vals = sorted(uniq.to_pylist()) if len(uniq) <= cap - 1 else None
    return pa.Table.from_arrays(
        [
            pa.array([name], type=pa.string()),
            pa.array([n], type=pa.int64()),
            pa.array([n_null], type=pa.int64()),
            pa.array([num_min], type=pa.float64()),
            pa.array([num_max], type=pa.float64()),
            pa.array([len_min], type=pa.int64()),
            pa.array([len_max], type=pa.int64()),
            pa.array([enum_vals], type=pa.list_(pa.string())),
        ],
        schema=_PARTIAL_SCHEMA,
    )


def infer_report(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
    *,
    max_enum: int = 16,
) -> pa.Table:
    """One merged stats row per column (the evidence behind the spec).

    Returns an Arrow table with schema ``_PARTIAL_SCHEMA``; ``enum_vals``
    is NULL when the column's distinct count exceeded ``max_enum``.
    """
    import ray.data  # noqa: F401  (type only)

    if columns is None:
        columns = ds.schema().names
    partials = ds.map_batches(
        _InferPartial(columns, max_enum),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        # stamp the cap so the merge (a plain function on a shuffled
        # group) doesn't need driver state
        lambda t: t.append_column("cap", pa.array([max_enum + 1] * len(t), pa.int64())),
        batch_format="pyarrow",
    )
    merged = partials.groupby("column").map_groups(
        _merge_column, batch_format="pyarrow"
    )
    # one dict per column — bounded by #columns, type-pinned re-assembly
    # (a pandas round-trip would let an all-overflow enum column decay
    # to null type)
    rows = sorted(merged.take_all(), key=lambda r: r["column"])
    return pa.Table.from_arrays(
        [
            pa.array(
                [
                    (
                        list(r[f.name])
                        if r[f.name] is not None and pa.types.is_list(f.type)
                        else r[f.name]
                    )
                    for r in rows
                ],
                type=f.type,
            )
            for f in _PARTIAL_SCHEMA
        ],
        schema=_PARTIAL_SCHEMA,
    )


def infer_table_spec(
    ds: "ray.data.Dataset",
    table: str,
    columns: list[str] | None = None,
    *,
    max_enum: int = 16,
    row_ref: list[str] | None = None,
    completeness: bool = True,
) -> dict:
    """Infer a declarative table spec (compile_table_spec shape).

    Rules (each provably satisfied by the profiled data — see module
    docstring for the self-consistency guarantee):

    - ``type``: Arrow dtype -> k_type category (always emitted)
    - ``required``: zero nulls observed (floats: zero NaNs too)
    - ``minimum``/``maximum``: closed observed bounds, numeric columns
    - ``minLength``/``maxLength``: observed code-point bounds, strings
    - ``enum``: full distinct set when ≤ ``max_enum`` string values
    - ``checks``: for a NULLABLE column (when ``completeness=True``), a
      table-level ``kind: completeness`` check pinning the observed
      null rate as ``max_null_rate`` — the profiled data sits exactly
      AT the threshold (the check fires only strictly above it), so
      self-consistency holds while any null-rate REGRESSION on future
      data trips the contract.
    """
    if columns is None:
        columns = ds.schema().names
    type_by_col = {
        name: _type_category(t)
        for name, t in zip(ds.schema().names, ds.schema().types)
    }
    report = infer_report(ds, columns, max_enum=max_enum)
    colspecs: dict[str, dict] = {}
    checks: list[dict] = []
    for i in range(len(report)):
        c = report["column"][i].as_py()
        spec: dict = {"type": type_by_col[c]}
        n_i = report["n"][i].as_py()
        nn_i = report["n_null"][i].as_py()
        if n_i > 0 and nn_i == 0:
            spec["required"] = True
        elif completeness and n_i > 0 and nn_i > 0:
            # same doubles both sides: observed rate == threshold never
            # fires (check requires rate STRICTLY above max_null_rate)
            checks.append(
                {
                    "kind": "completeness",
                    "column": c,
                    "max_null_rate": nn_i / n_i,
                }
            )
        nmin = report["num_min"][i].as_py()
        nmax = report["num_max"][i].as_py()
        if nmin is not None and not np.isnan(nmin) and type_by_col[c] in ("integer", "number"):
            spec["minimum"] = nmin
            spec["maximum"] = nmax
        if type_by_col[c] == "string":
            if report["len_min"][i].as_py() >= 0:
                spec["minLength"] = report["len_min"][i].as_py()
                spec["maxLength"] = report["len_max"][i].as_py()
            ev = report["enum_vals"][i].as_py()
            if ev:
                spec["enum"] = ev
        colspecs[c] = spec
    out = {"table": table, "columns": colspecs}
    if checks:
        out["checks"] = checks
    if row_ref:
        out["row_ref"] = row_ref
    return out


def diff_specs(old: dict, new: dict) -> pa.Table:
    """Contract drift between two inferred (or authored) table specs —
    the schema-evolution report an operator reads before promoting
    yesterday's inferred contract over today's corpus.

    Driver-side on two spec dicts (specs are O(columns) — no data
    moves). One row per detected change:

    - ``added_column`` / ``removed_column``
    - ``type_changed``
    - ``required_added`` (new data is stricter) / ``required_dropped``
      (new data has nulls where the old contract forbade them — the
      alarming direction)
    - ``bounds_widened`` / ``bounds_narrowed`` (numeric min/max or
      string length envelope)
    - ``enum_values_added`` / ``enum_values_removed`` / ``enum_dropped``
      (cardinality blew past the cap) / ``enum_added``

    Returns ``(column, change, old, new)`` with values rendered as
    strings (empty = not applicable).
    """
    rows: list[tuple[str, str, str, str]] = []
    oc, nc = old.get("columns", {}), new.get("columns", {})
    for c in sorted(set(oc) - set(nc)):
        rows.append((c, "removed_column", str(oc[c].get("type", "")), ""))
    for c in sorted(set(nc) - set(oc)):
        rows.append((c, "added_column", "", str(nc[c].get("type", ""))))
    for c in sorted(set(oc) & set(nc)):
        o, n = oc[c], nc[c]
        if o.get("type") != n.get("type"):
            rows.append((c, "type_changed", str(o.get("type")), str(n.get("type"))))
        oreq, nreq = bool(o.get("required")), bool(n.get("required"))
        if nreq and not oreq:
            rows.append((c, "required_added", "false", "true"))
        elif oreq and not nreq:
            rows.append((c, "required_dropped", "true", "false"))
        ob = (o.get("minimum"), o.get("maximum"), o.get("minLength"), o.get("maxLength"))
        nb = (n.get("minimum"), n.get("maximum"), n.get("minLength"), n.get("maxLength"))
        if ob != nb and any(v is not None for v in ob + nb):
            widened = (
                (nb[0] is not None and ob[0] is not None and nb[0] < ob[0])
                or (nb[1] is not None and ob[1] is not None and nb[1] > ob[1])
                or (nb[2] is not None and ob[2] is not None and nb[2] < ob[2])
                or (nb[3] is not None and ob[3] is not None and nb[3] > ob[3])
            )
            rows.append(
                (
                    c,
                    "bounds_widened" if widened else "bounds_narrowed",
                    str(ob),
                    str(nb),
                )
            )
        oe, ne = o.get("enum"), n.get("enum")
        if oe is not None and ne is None:
            rows.append((c, "enum_dropped", ",".join(oe), ""))
        elif oe is None and ne is not None:
            rows.append((c, "enum_added", "", ",".join(ne)))
        elif oe is not None and ne is not None and oe != ne:
            added = sorted(set(ne) - set(oe))
            removed = sorted(set(oe) - set(ne))
            if added:
                rows.append((c, "enum_values_added", "", ",".join(added)))
            if removed:
                rows.append((c, "enum_values_removed", ",".join(removed), ""))
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], type=pa.string()),
            "change": pa.array([r[1] for r in rows], type=pa.string()),
            "old": pa.array([r[2] for r in rows], type=pa.string()),
            "new": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
