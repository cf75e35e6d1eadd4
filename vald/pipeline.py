"""Plan & run: read → stamp → fused row-checks → shuffled checks →
verdict fold (SURVEY.md §3.2-§3.4).

Execution shape (Ray-Data-first, BASELINE.json north_rule):

- ONE ``map_batches`` actor-pool pass (``RowValidator``) evaluates every
  row-kind check of the ConstraintSet per zero-copy Arrow batch and
  emits a small *result stream*: per-batch verdict partials + violation
  rows, in one fixed Arrow schema (RESULT_SCHEMA). The input is read
  once; the result stream is ~|violations| + O(batches × constraints)
  rows — orders of magnitude smaller than the input — so it is safe to
  materialize (or write to Parquet at scale) and derive both outputs.
- Distributed checks (unique B4, refint B5, drift B9) are planned as
  their own stages in vald.constraints_dist and UNION their result
  streams into the same schema.
- Verdict fold (B10): groupby (partition_id, constraint_id) over the
  tiny partial rows; sums are commutative+associative so verdicts are
  identical at any parallelism (SURVEY.md §4.3 determinism).

Stateful setup (compiled regexes, broadcast parent-key sets, baseline
profiles) happens once per actor in ``RowValidator.__init__`` (B7).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from . import hashing
from .ir import CompiledCheck, ConstraintSet, compile_table_spec

__all__ = [
    "RESULT_SCHEMA",
    "RowValidator",
    "ValidationResult",
    "validate",
    "stamp",
    "result_rows",
]

RESULT_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("constraint_id", pa.string()),
        ("row_ref", pa.string()),
        ("column", pa.string()),
        ("observed", pa.string()),
        ("detail", pa.string()),
        ("is_violation", pa.bool_()),
        ("n_checked", pa.int64()),
        ("n_violations", pa.int64()),
    ]
)

VERDICT_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("constraint_id", pa.string()),
        ("pass", pa.bool_()),
        ("n_checked", pa.int64()),
        ("n_violations", pa.int64()),
        ("metrics_json", pa.string()),
    ]
)

# Cap on violation detail rows emitted per (constraint, batch): verdict
# counts stay exact; exemplar rows are bounded so a pathological batch
# (100% violations at 100 TB) cannot blow up the result stream.
DEFAULT_MAX_VIOLATIONS_PER_BATCH = 100_000


def result_rows(
    rows: dict[str, list],
) -> pa.Table:
    """Build a RESULT_SCHEMA table from column lists (missing → default)."""
    n = len(rows.get("constraint_id", []))
    defaults: dict[str, Any] = {
        "partition_id": [0] * n,
        "row_ref": [""] * n,
        "column": [""] * n,
        "observed": [""] * n,
        "detail": [""] * n,
        "is_violation": [False] * n,
        "n_checked": [0] * n,
        "n_violations": [0] * n,
    }
    cols = []
    for f in RESULT_SCHEMA:
        data = rows.get(f.name, defaults.get(f.name))
        cols.append(pa.array(data, type=f.type))
    return pa.Table.from_arrays(cols, schema=RESULT_SCHEMA)


def _empty_result() -> pa.Table:
    return result_rows({"constraint_id": []})


def build_row_ref(t: pa.Table, cs: ConstraintSet) -> pa.Array | None:
    """Vectorized canonical row_ref string (FIXTURES.md §5):
    template '{repo}@{commit}:{path}' or '|'-joined key columns."""
    cols = cs.row_ref_cols
    if not cols:
        return None
    if cs.row_ref_template:
        # split template into literal separators around {col} placeholders
        import re as _re

        parts = _re.split(r"\{(\w+)\}", cs.row_ref_template)
        # parts = [lit0, col1, lit1, col2, lit2, ...]
        arrays: list = []
        seps: list[str] = []
        pending = parts[0]
        for i in range(1, len(parts), 2):
            colname, lit = parts[i], parts[i + 1]
            arr = pc.fill_null(pc.cast(t[colname], pa.string()), "<null>")
            if pending:
                arr = pc.binary_join_element_wise(pa.array([pending] * len(t)), arr, "")
                pending = ""
            arrays.append(arr)
            seps.append(lit)
        out = arrays[0]
        for arr, lit in zip(arrays[1:], seps[:-1]):
            out = pc.binary_join_element_wise(out, arr, lit)
        if seps and seps[-1]:
            out = pc.binary_join_element_wise(out, pa.array([seps[-1]] * len(t)), "")
        return out
    joined = [pc.fill_null(pc.cast(t[c], pa.string()), "<null>") for c in cols]
    if len(joined) == 1:
        return joined[0]
    return pc.binary_join_element_wise(*joined, "|")


def build_partition_ids(t: pa.Table, cs: ConstraintSet) -> np.ndarray:
    if cs.partition_by is None:
        return np.zeros(len(t), dtype=np.int32)
    return hashing.partition_ids(t[cs.partition_by], cs.num_partitions)


class RowValidator:
    """Actor-pool callable (B7): compiles the spec ONCE per actor in
    __init__ (regexes, broadcast key sets), evaluates every row check
    per batch in __call__, emits RESULT_SCHEMA rows."""

    def __init__(
        self,
        spec: dict | None = None,
        cset: ConstraintSet | None = None,
        broadcast_refs: dict[str, "ray.ObjectRef"] | None = None,
        max_violations_per_batch: int = DEFAULT_MAX_VIOLATIONS_PER_BATCH,
    ):
        self.cs = cset if cset is not None else compile_table_spec(spec)
        self.max_v = max_violations_per_batch
        # broadcast small-side key sets for refint (B5 broadcast fallback):
        # ray.put once on the driver, ray.get once per actor here.
        self.key_sets: dict[str, frozenset] = {}
        for cid, ref in (broadcast_refs or {}).items():
            obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.key_sets[cid] = frozenset(obj)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cs = self.cs
        n = len(batch)
        if n == 0:
            return _empty_result()
        pids = build_partition_ids(batch, cs)
        refs = build_row_ref(batch, cs)
        ref_list: list[str] | None = None

        out: dict[str, list] = {
            "partition_id": [],
            "constraint_id": [],
            "row_ref": [],
            "column": [],
            "observed": [],
            "detail": [],
            "is_violation": [],
            "n_checked": [],
            "n_violations": [],
        }

        def emit_partials(cid: str, checked: np.ndarray, bad: np.ndarray):
            # one verdict-partial row per (partition, constraint) per batch
            for pid in np.unique(pids):
                sel = pids == pid
                out["partition_id"].append(int(pid))
                out["constraint_id"].append(cid)
                out["row_ref"].append("")
                out["column"].append("")
                out["observed"].append("")
                out["detail"].append("")
                out["is_violation"].append(False)
                out["n_checked"].append(int(np.count_nonzero(checked & sel)))
                out["n_violations"].append(int(np.count_nonzero(bad & sel)))

        for check in cs.row_checks:
            ok = check.eval(batch)
            checked = check.checked_mask(batch)
            bad = checked & ~ok
            emit_partials(check.constraint_id, checked, bad)
            idx = np.flatnonzero(bad)
            if len(idx) == 0:
                continue
            if len(idx) > self.max_v:
                idx = idx[: self.max_v]
            if ref_list is None:
                ref_list = refs.to_pylist() if refs is not None else [""] * n
            observed = check.observed(batch, idx)
            for j, i in enumerate(idx):
                out["partition_id"].append(int(pids[i]))
                out["constraint_id"].append(check.constraint_id)
                out["row_ref"].append(ref_list[i])
                out["column"].append(check.column or "")
                out["observed"].append(observed[j])
                out["detail"].append(check.keyword)
                out["is_violation"].append(True)
                out["n_checked"].append(0)
                out["n_violations"].append(0)

        # broadcast refint (B5): membership test against actor-held set
        for dist in cs.dist_checks:
            if dist.kind != "refint" or dist.constraint_id not in self.key_sets:
                continue
            cols = dist.params["columns"]
            keyset = self.key_sets[dist.constraint_id]
            if len(cols) == 1:
                vals = batch[cols[0]].to_pylist()
            else:
                vals = list(zip(*(batch[c].to_pylist() for c in cols)))
            checked = np.fromiter((v is not None for v in vals), dtype=bool, count=n)
            bad = np.fromiter(
                (v is not None and v not in keyset for v in vals), dtype=bool, count=n
            )
            emit_partials(dist.constraint_id, checked, bad)
            idx = np.flatnonzero(bad)[: self.max_v]
            if len(idx):
                if ref_list is None:
                    ref_list = refs.to_pylist() if refs is not None else [""] * n
                for i in idx:
                    out["partition_id"].append(int(pids[i]))
                    out["constraint_id"].append(dist.constraint_id)
                    out["row_ref"].append(ref_list[i])
                    out["column"].append(",".join(cols))
                    out["observed"].append(str(vals[i]))
                    out["detail"].append("refint")
                    out["is_violation"].append(True)
                    out["n_checked"].append(0)
                    out["n_violations"].append(0)

        return result_rows(out)


def stamp(
    ds: "ray.data.Dataset",
    cs: ConstraintSet,
    *,
    sha_of: str | None = None,
    drop: list[str] | None = None,
) -> "ray.data.Dataset":
    """B3: append ``row_ref``, ``partition_id`` (and ``content_sha`` when
    ``sha_of`` names a column) to every row. ``drop`` prunes wide columns
    right after hashing (memory discipline, SURVEY.md §4.3)."""

    def _stamp(t: pa.Table) -> pa.Table:
        refs = build_row_ref(t, cs)
        if refs is not None and "row_ref" not in t.column_names:
            t = t.append_column("row_ref", refs)
        if "partition_id" not in t.column_names:
            t = t.append_column(
                "partition_id", pa.array(build_partition_ids(t, cs), type=pa.int32())
            )
        if sha_of is not None:
            t = t.append_column(
                f"{sha_of}_sha",
                pa.array(hashing.sha256_hex_column(t[sha_of]), type=pa.string()),
            )
        if drop:
            t = t.drop_columns([c for c in drop if c in t.column_names])
        return t

    return ds.map_batches(_stamp, batch_format="pyarrow")


@dataclass
class ValidationResult:
    """Both outputs derive from one materialized (small) result stream."""

    combined: "ray.data.Dataset"

    def violations(self) -> "ray.data.Dataset":
        return self.combined.map_batches(
            lambda t: t.filter(t["is_violation"]).select(
                ["partition_id", "constraint_id", "row_ref", "column", "observed", "detail"]
            ),
            batch_format="pyarrow",
        )

    def verdicts(self) -> "ray.data.Dataset":
        partials = self.combined.map_batches(
            lambda t: t.filter(pc.invert(t["is_violation"])).select(
                ["partition_id", "constraint_id", "n_checked", "n_violations"]
            ),
            batch_format="pyarrow",
        )
        agg = partials.groupby(["partition_id", "constraint_id"]).aggregate(
            Sum("n_checked", alias_name="n_checked"),
            Sum("n_violations", alias_name="n_violations"),
        )

        def _finish(t: pa.Table) -> pa.Table:
            nv = t["n_violations"]
            passed = pc.equal(nv, pa.scalar(0))
            metrics = [
                json.dumps({"n_checked": c, "n_violations": v})
                for c, v in zip(t["n_checked"].to_pylist(), nv.to_pylist())
            ]
            return pa.Table.from_arrays(
                [
                    pc.cast(t["partition_id"], pa.int32()),
                    t["constraint_id"],
                    passed,
                    pc.cast(t["n_checked"], pa.int64()),
                    pc.cast(nv, pa.int64()),
                    pa.array(metrics, type=pa.string()),
                ],
                schema=VERDICT_SCHEMA,
            )

        return agg.map_batches(_finish, batch_format="pyarrow")

    def violations_table(self) -> pa.Table:
        """Deterministically sorted violations (small result)."""
        t = pa.Table.from_pandas(
            self.violations().to_pandas(), preserve_index=False
        )
        if len(t) == 0:
            return t
        return t.sort_by(
            [("constraint_id", "ascending"), ("row_ref", "ascending"), ("column", "ascending")]
        )

    def verdicts_table(self) -> pa.Table:
        t = pa.Table.from_pandas(self.verdicts().to_pandas(), preserve_index=False)
        if len(t) == 0:
            return t
        return t.sort_by(
            [("constraint_id", "ascending"), ("partition_id", "ascending")]
        )

    def passed(self) -> bool:
        v = self.verdicts_table()
        if len(v) == 0:
            return True
        return bool(pc.all(v["pass"]).as_py())


def validate(
    ds: "ray.data.Dataset",
    spec: dict | ConstraintSet,
    *,
    parents: dict[str, "ray.data.Dataset | pa.Table | list"] | None = None,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int | None = None,
    materialize: bool = True,
    out_dir: str | None = None,
) -> ValidationResult:
    """Run the full ConstraintSet against a Dataset.

    ``parents`` maps refint parent_table name → its key source (Dataset /
    Arrow table / list of keys); small parents are broadcast via
    ``ray.put`` (read once per actor), which is the no-shuffle path for
    dimension tables (SURVEY.md B5).
    """
    cs = spec if isinstance(spec, ConstraintSet) else compile_table_spec(spec)

    # --- broadcast refint parents (driver-side, once) ---
    broadcast_refs: dict[str, ray.ObjectRef] = {}
    for dist in cs.dist_checks:
        if dist.kind != "refint":
            continue
        pt = dist.params.get("parent_table")
        src = (parents or {}).get(pt) if pt else None
        if src is None and dist.params.get("parent_path"):
            src = ray.data.read_parquet(
                dist.params["parent_path"], columns=list(dist.params["parent_columns"])
            )
        if src is None:
            continue
        pcols = list(dist.params["parent_columns"])
        if isinstance(src, ray.data.Dataset):
            # small side (dimension table): collect distinct keys on the
            # driver and broadcast; large parents should use
            # constraints_dist.refint_anti_join_results instead.
            keys_t = pa.Table.from_pandas(
                src.select_columns(pcols).to_pandas().drop_duplicates(),
                preserve_index=False,
            )
        elif isinstance(src, pa.Table):
            keys_t = src.select(pcols)
        else:
            broadcast_refs[dist.constraint_id] = ray.put(set(src))
            continue
        if len(pcols) == 1:
            keys = set(keys_t[pcols[0]].to_pylist())
        else:
            keys = set(zip(*(keys_t[c].to_pylist() for c in pcols)))
        broadcast_refs[dist.constraint_id] = ray.put(keys)

    combined = ds.map_batches(
        RowValidator,
        fn_constructor_kwargs={"cset": cs, "broadcast_refs": broadcast_refs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )

    # --- shuffled checks (unique) union into the same result stream ---
    from . import constraints_dist as cd

    for dist in cs.dist_checks:
        if dist.kind == "unique":
            combined = combined.union(cd.unique_check_results(ds, cs, dist))
        elif dist.kind == "refint" and dist.constraint_id not in broadcast_refs:
            pass  # no parent supplied → skipped (recorded nowhere; caller error)
        elif dist.kind == "drift":
            combined = combined.union(cd.drift_check_results(ds, cs, dist))

    if out_dir is not None:
        combined.write_parquet(out_dir + "/_results")
        combined = ray.data.read_parquet(out_dir + "/_results")
    elif materialize:
        combined = combined.materialize()
    return ValidationResult(combined)
