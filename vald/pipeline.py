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


# Extended (internal) schema emitted by RowValidator: result rows plus
# uniqueness key-partial rows ("rec" == "key") so the unique check
# shares the SAME input pass as the row checks — the input (and its
# wide content column) is read and decoded exactly once. Key rows
# carry (uh = stable hash of the key, ubucket = uh % B, ucnt =
# within-batch multiplicity); the canonical key string rides in
# row_ref. _project_res() strips key rows back to RESULT_SCHEMA.
EXT_SCHEMA = pa.schema(
    list(RESULT_SCHEMA)
    + [
        ("rec", pa.string()),
        ("uh", pa.uint64()),
        ("ubucket", pa.int32()),
        ("ucnt", pa.int64()),
    ]
)


def ext_rows(rows: dict[str, list]) -> pa.Table:
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
        "rec": ["res"] * n,
        "uh": [0] * n,
        "ubucket": [0] * n,
        "ucnt": [0] * n,
    }
    cols = []
    for f in EXT_SCHEMA:
        data = rows.get(f.name, defaults.get(f.name))
        cols.append(pa.array(data, type=f.type))
    return pa.Table.from_arrays(cols, schema=EXT_SCHEMA)


def _empty_ext() -> pa.Table:
    return ext_rows({"constraint_id": []})


def _project_res(t: pa.Table) -> pa.Table:
    t = t.filter(pc.equal(t["rec"], pa.scalar("res")))
    return t.select(RESULT_SCHEMA.names)


def _key_partial_table(
    cid: str,
    rec: str,
    ref_arr,
    pid_arr,
    h: np.ndarray,
    bucket: np.ndarray,
    cnt_arr,
) -> pa.Table:
    """Arrow-native EXT_SCHEMA key-partial rows — no Python lists.

    The key partials are ~one row per DISTINCT key per batch (≈ batch
    size for fine-grained keys like (repo,path,commit)), so this path
    must stay entirely in Arrow/numpy: the ref strings ride zero-copy
    from the per-batch ``group_by``, constants come from ``pa.repeat``
    (C++-level, no per-row Python objects). Measured: the previous
    list-based emission (`to_pylist()` of n refs + list rebuild) was the
    single largest allocation source in the fused pass on this VM's
    ~45 MB/s/stream allocator."""
    k = len(ref_arr)
    if isinstance(ref_arr, pa.ChunkedArray):
        ref_arr = ref_arr.combine_chunks()
    if isinstance(pid_arr, pa.ChunkedArray):
        pid_arr = pid_arr.combine_chunks()
    if isinstance(cnt_arr, pa.ChunkedArray):
        cnt_arr = cnt_arr.combine_chunks()
    zero64 = pa.repeat(pa.scalar(0, pa.int64()), k)
    empty = pa.repeat("", k)
    return pa.Table.from_arrays(
        [
            pid_arr.cast(pa.int32()),
            pa.repeat(cid, k),
            ref_arr.cast(pa.string()),
            empty,
            empty,
            empty,
            pa.repeat(False, k),
            zero64,
            zero64,
            pa.repeat(rec, k),
            pa.array(h, type=pa.uint64()),
            pa.array(bucket, type=pa.int32()),
            cnt_arr.cast(pa.int64()),
        ],
        schema=EXT_SCHEMA,
    )


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


_TYPE_CATEGORY_CHECKS = [
    ("string", lambda t: pa.types.is_string(t) or pa.types.is_large_string(t)),
    ("integer", pa.types.is_integer),
    ("number", lambda t: pa.types.is_floating(t) or pa.types.is_decimal(t)),
    ("boolean", pa.types.is_boolean),
    ("timestamp", pa.types.is_timestamp),
    ("binary", lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t)),
    (
        "array",
        lambda t: pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t),
    ),
    ("object", pa.types.is_struct),
]


def _type_category(t: pa.DataType) -> str:
    for name, check in _TYPE_CATEGORY_CHECKS:
        if check(t):
            return name
    return str(t)


def schema_congruence_rows(observed: pa.Schema, cs: ConstraintSet) -> pa.Table:
    """A11 (additionalProperties, table-level): observed schema fields
    vs the declared physical schema — a PLAN-TIME check producing
    result rows (one verdict + violations per offending column).
    'number' accepts integer columns (integers are numbers, spec03 §5.1)."""
    declared = cs.declared_schema or {}
    cid = f"{cs.table}.__schema__.congruence"
    out: dict[str, list] = {k.name: [] for k in RESULT_SCHEMA}

    def violation(colname: str, observed_desc: str, detail: str):
        out["partition_id"].append(0)
        out["constraint_id"].append(cid)
        out["row_ref"].append(colname)
        out["column"].append(colname)
        out["observed"].append(observed_desc)
        out["detail"].append(detail)
        out["is_violation"].append(True)
        out["n_checked"].append(0)
        out["n_violations"].append(0)

    obs = {f.name: f.type for f in observed}
    n_bad = 0
    for colname, want in declared.items():
        if colname not in obs:
            violation(colname, "<missing>", "schema.missing_column")
            n_bad += 1
            continue
        got = _type_category(obs[colname])
        ok = got == want or (want == "number" and got == "integer")
        if not ok:
            violation(colname, got, "schema.type_mismatch")
            n_bad += 1
    if cs.closed_world:
        for colname in obs:
            if colname not in declared:
                violation(colname, _type_category(obs[colname]), "schema.undeclared_column")
                n_bad += 1
    # one verdict partial: n_checked = number of declared columns (+
    # observed ones under closed_world)
    out["partition_id"].append(0)
    out["constraint_id"].append(cid)
    out["row_ref"].append("")
    out["column"].append("")
    out["observed"].append("")
    out["detail"].append("")
    out["is_violation"].append(False)
    out["n_checked"].append(len(declared) + (len(obs) if cs.closed_world else 0))
    out["n_violations"].append(n_bad)
    return result_rows(out)


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
        refint_fused: dict[str, list[str]] | None = None,
    ):
        self.cs = cset if cset is not None else compile_table_spec(spec)
        self.max_v = max_violations_per_batch
        # refint checks routed through the large-parent anti-join path:
        # this validator emits their child-key partials inline
        # (rec == "rkey") so the anti-join never re-reads the input.
        self.refint_fused = refint_fused or {}
        # broadcast small-side key sets for refint (B5 broadcast fallback):
        # ray.put once on the driver, ray.get once per actor/worker here.
        # Keys are prebuilt as Arrow arrays so the per-batch membership
        # test is a vectorized pc.is_in — no per-row Python objects
        # (this VM's allocator makes object churn very expensive).
        self.key_arrays: dict[str, pa.Array] = {}
        # bloom-screen refint (opt-in): parent keys as a Bloom filter —
        # 2 B/key broadcast vs 8+ B/key exact; one-sided error (an
        # orphan child passes with prob = filter FPR), see validate()
        self.bloom_filters: dict[str, object] = {}
        from .hashing import KEY_SEP
        from .ops.decontam import BloomFilter

        for cid, ref in (broadcast_refs or {}).items():
            obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            if isinstance(obj, BloomFilter):
                self.bloom_filters[cid] = obj
                continue
            vals = list(obj)
            if vals and isinstance(vals[0], tuple):
                vals = [KEY_SEP.join(map(str, v)) for v in vals]
            self.key_arrays[cid] = pa.array(vals)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cs = self.cs
        n = len(batch)
        if n == 0:
            return _empty_ext()
        pids = build_partition_ids(batch, cs)
        refs = build_row_ref(batch, cs)

        def refs_at(idx: np.ndarray) -> list[str]:
            # only the violating rows' refs are ever materialized to
            # Python (idx is capped at max_v) — a full-batch to_pylist
            # here would run on every batch containing ANY violation
            if refs is None:
                return [""] * len(idx)
            taken = refs.take(pa.array(idx, type=pa.int64()))
            return ["<null>" if v is None else v for v in taken.to_pylist()]

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
            "rec": [],
            "uh": [],
            "ubucket": [],
            "ucnt": [],
        }

        def pad_ext(k: int):
            out["rec"].extend(["res"] * k)
            out["uh"].extend([0] * k)
            out["ubucket"].extend([0] * k)
            out["ucnt"].extend([0] * k)

        P = max(int(pids.max()) + 1, 1) if n else 1

        def emit_partials(cid: str, checked: np.ndarray, bad: np.ndarray):
            # one verdict-partial row per (partition, constraint) per
            # batch — vectorized (np.bincount), no per-partition loop
            n_checked = np.bincount(pids, weights=checked, minlength=P)
            n_bad = np.bincount(pids, weights=bad, minlength=P)
            present = np.flatnonzero((n_checked > 0) | (n_bad > 0))
            if len(present) == 0:
                present = np.array([0])
            k = len(present)
            out["partition_id"].extend(present.tolist())
            out["constraint_id"].extend([cid] * k)
            out["row_ref"].extend([""] * k)
            out["column"].extend([""] * k)
            out["observed"].extend([""] * k)
            out["detail"].extend([""] * k)
            out["is_violation"].extend([False] * k)
            out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
            out["n_violations"].extend(n_bad[present].astype(np.int64).tolist())
            pad_ext(k)

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
            v_refs = refs_at(idx)
            observed = check.observed(batch, idx)
            for j, i in enumerate(idx):
                out["partition_id"].append(int(pids[i]))
                out["constraint_id"].append(check.constraint_id)
                out["row_ref"].append(v_refs[j])
                out["column"].append(check.column or "")
                out["observed"].append(observed[j])
                out["detail"].append(check.keyword)
                out["is_violation"].append(True)
                out["n_checked"].append(0)
                out["n_violations"].append(0)
                pad_ext(1)

        # broadcast refint (B5): vectorized membership (pc.is_in)
        # against the actor-held Arrow key array — zero Python objects.
        # Large-parent refint checks (self.refint_fused) skip this and
        # emit key partials below instead.
        for dist in cs.dist_checks:
            if dist.kind != "refint" or (
                dist.constraint_id not in self.key_arrays
                and dist.constraint_id not in self.bloom_filters
            ):
                continue
            cols = dist.params["columns"]
            if len(cols) == 1:
                keycol = batch[cols[0]]
            else:
                from .hashing import KEY_SEP as _SEP

                joined = [pc.cast(batch[c], pa.string()) for c in cols]
                keycol = pc.binary_join_element_wise(*joined, _SEP)
            checked_pa = pc.is_valid(keycol)
            if dist.constraint_id in self.bloom_filters:
                # bloom screen: a miss is a DEFINITE orphan; an FP
                # (≈4e-4) lets an orphan pass — violations are a
                # one-sided under-count, never false alarms
                from .hashing import stable_hash64

                h = stable_hash64(pc.cast(keycol, pa.string()))
                ok_np = self.bloom_filters[dist.constraint_id].contains(h)
                ok_pa = pa.array(ok_np)
            else:
                value_set = self.key_arrays[dist.constraint_id]
                if value_set.type != keycol.type:
                    value_set = value_set.cast(keycol.type)
                ok_pa = pc.is_in(keycol, value_set=value_set)
            checked = np.asarray(
                checked_pa.to_numpy(zero_copy_only=False), dtype=bool
            )
            bad = checked & ~np.asarray(
                pc.fill_null(ok_pa, False).to_numpy(zero_copy_only=False), dtype=bool
            )
            emit_partials(dist.constraint_id, checked, bad)
            idx = np.flatnonzero(bad)[: self.max_v]
            if len(idx):
                v_refs = refs_at(idx)
                from .kernels import observed_strings as _obs

                observed = _obs(keycol, idx)
                for j, i in enumerate(idx):
                    out["partition_id"].append(int(pids[i]))
                    out["constraint_id"].append(dist.constraint_id)
                    out["row_ref"].append(v_refs[j])
                    out["column"].append(",".join(cols))
                    out["observed"].append(observed[j])
                    out["detail"].append("refint")
                    out["is_violation"].append(True)
                    out["n_checked"].append(0)
                    out["n_violations"].append(0)
                    pad_ext(1)

        # fused uniqueness key partials (B4): within-batch local
        # group-by of the key, emitted as "key" records — the unique
        # check shares THIS pass instead of re-reading the input.
        # Entirely Arrow-native (see _key_partial_table).
        import pyarrow.compute as _pc2

        from .hashing import KEY_SEP, stable_hash64

        key_tables: list[pa.Table] = []
        pids_arr = pa.array(pids, type=pa.int32())
        ones = pa.array(np.ones(n, dtype=np.int64))
        for dist in cs.dist_checks:
            if dist.kind != "unique":
                continue
            num_buckets = int(dist.params.get("num_buckets", 256))
            cols = list(dist.params["columns"])
            if set(cols) == set(cs.row_ref_cols) and cs.row_ref_template:
                kref = refs
            else:
                keys = [
                    _pc2.fill_null(_pc2.cast(batch[c], pa.string()), "<null>")
                    for c in cols
                ]
                kref = (
                    keys[0]
                    if len(keys) == 1
                    else _pc2.binary_join_element_wise(*keys, KEY_SEP)
                )
            # group by (ref, pid) — NOT ref with min(pid) — so a key that
            # spans partitions inside one batch attributes its count to
            # each actual partition exactly (ADVICE r2); downstream
            # consumers already merge same-ref rows across partials.
            small = pa.table({"ref": kref, "pid": pids_arr, "cnt": ones})
            agg = small.group_by(["ref", "pid"], use_threads=False).aggregate(
                [("cnt", "sum")]
            )
            agg = agg.rename_columns(["ref", "pid", "cnt"])
            h = stable_hash64(agg["ref"])
            key_tables.append(
                _key_partial_table(
                    dist.constraint_id,
                    "key",
                    agg["ref"],
                    agg["pid"],
                    h,
                    (h % np.uint64(num_buckets)).astype(np.int32),
                    agg["cnt"],
                )
            )

        # fused refint child-key partials (B5 large-parent path): one
        # row per distinct non-null child key per batch; the anti-join
        # stage (constraints_dist.fused_refint_anti_results) consumes
        # these instead of re-reading the input.
        for dist in cs.dist_checks:
            if dist.kind != "refint" or dist.constraint_id not in self.refint_fused:
                continue
            num_buckets = int(dist.params.get("num_buckets", 256))
            cols = self.refint_fused[dist.constraint_id]
            valid = np.ones(n, dtype=bool)
            for c in cols:
                valid &= np.asarray(
                    _pc2.is_valid(batch[c]).to_numpy(zero_copy_only=False), dtype=bool
                )
            keys = [_pc2.cast(batch[c], pa.string()) for c in cols]
            kref = (
                keys[0]
                if len(keys) == 1
                else _pc2.binary_join_element_wise(*keys, KEY_SEP)
            )
            small = pa.table({"ref": kref, "pid": pids_arr, "cnt": ones})
            if not valid.all():
                small = small.filter(pa.array(valid))
            if len(small) == 0:
                continue
            # (ref, pid) grouping for exact per-partition attribution —
            # same rationale as the unique partials above (ADVICE r2)
            agg = small.group_by(["ref", "pid"], use_threads=False).aggregate(
                [("cnt", "sum")]
            )
            agg = agg.rename_columns(["ref", "pid", "cnt"])
            h = stable_hash64(agg["ref"])
            key_tables.append(
                _key_partial_table(
                    dist.constraint_id,
                    "rkey",
                    agg["ref"],
                    agg["pid"],
                    h,
                    (h % np.uint64(num_buckets)).astype(np.int32),
                    agg["cnt"],
                )
            )

        res = ext_rows(out)
        if not key_tables:
            return res
        return pa.concat_tables([res, *key_tables])


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
            name = f"{sha_of}_sha"
            if name in t.column_names:  # engine-computed value wins
                t = t.drop_columns([name])
            t = t.append_column(
                name,
                pa.array(hashing.sha256_hex_column(t[sha_of]), type=pa.string()),
            )
        if drop:
            t = t.drop_columns([c for c in drop if c in t.column_names])
        return t

    return ds.map_batches(_stamp, batch_format="pyarrow")


# Above this many result rows the fold stays distributed (groupby on
# the cluster); below it the result stream is pulled to the driver and
# folded with pyarrow (milliseconds vs a full shuffle round-trip).
LOCAL_FOLD_MAX_ROWS = 2_000_000


def _fold_verdicts_local(t: pa.Table) -> pa.Table:
    partials = t.filter(pc.invert(t["is_violation"]))
    agg = (
        partials.select(["partition_id", "constraint_id", "n_checked", "n_violations"])
        .group_by(["partition_id", "constraint_id"], use_threads=False)
        .aggregate([("n_checked", "sum"), ("n_violations", "sum")])
        .rename_columns(["partition_id", "constraint_id", "n_checked", "n_violations"])
    )
    nv = agg["n_violations"]
    metrics = [
        json.dumps({"n_checked": c, "n_violations": v})
        for c, v in zip(agg["n_checked"].to_pylist(), nv.to_pylist())
    ]
    return pa.Table.from_arrays(
        [
            pc.cast(agg["partition_id"], pa.int32()),
            agg["constraint_id"].combine_chunks()
            if isinstance(agg["constraint_id"], pa.ChunkedArray)
            else agg["constraint_id"],
            pc.equal(nv, pa.scalar(0)),
            pc.cast(agg["n_checked"], pa.int64()),
            pc.cast(nv, pa.int64()),
            pa.array(metrics, type=pa.string()),
        ],
        schema=VERDICT_SCHEMA,
    )


@dataclass
class ValidationResult:
    """Both outputs derive from one (small) result stream.

    The stream is bounded by design: O(batches × constraints ×
    partitions-per-batch) verdict partials plus per-batch-capped
    violation exemplars — it is NOT proportional to input rows. Small
    streams fold on the driver; huge ones fold distributed."""

    combined: "ray.data.Dataset"
    _local: pa.Table | None = None

    def _local_table(self) -> pa.Table | None:
        if self._local is None:
            cnt = self.combined.count()
            if cnt <= LOCAL_FOLD_MAX_ROWS:
                parts = ray.get(self.combined.to_arrow_refs())
                parts = [p for p in parts if len(p)]
                self._local = (
                    pa.concat_tables(parts).combine_chunks()
                    if parts
                    else _empty_result()
                )
        return self._local

    # --- Dataset-returning API (distributed path) ---
    def violations(self) -> "ray.data.Dataset":
        local = self._local_table()
        if local is not None:
            return ray.data.from_arrow(self._violations_of(local))
        return self.combined.map_batches(
            lambda t: t.filter(t["is_violation"]).select(
                ["partition_id", "constraint_id", "row_ref", "column", "observed", "detail"]
            ),
            batch_format="pyarrow",
        )

    def verdicts(self) -> "ray.data.Dataset":
        local = self._local_table()
        if local is not None:
            return ray.data.from_arrow(_fold_verdicts_local(local))
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
            metrics = [
                json.dumps({"n_checked": c, "n_violations": v})
                for c, v in zip(t["n_checked"].to_pylist(), nv.to_pylist())
            ]
            return pa.Table.from_arrays(
                [
                    pc.cast(t["partition_id"], pa.int32()),
                    t["constraint_id"],
                    pc.equal(nv, pa.scalar(0)),
                    pc.cast(t["n_checked"], pa.int64()),
                    pc.cast(nv, pa.int64()),
                    pa.array(metrics, type=pa.string()),
                ],
                schema=VERDICT_SCHEMA,
            )

        return agg.map_batches(_finish, batch_format="pyarrow")

    # --- local (Arrow table) API ---
    @staticmethod
    def _violations_of(t: pa.Table) -> pa.Table:
        return t.filter(t["is_violation"]).select(
            ["partition_id", "constraint_id", "row_ref", "column", "observed", "detail"]
        )

    def violations_table(self) -> pa.Table:
        """Deterministically sorted violations (small result)."""
        local = self._local_table()
        if local is not None:
            t = self._violations_of(local)
        else:
            t = pa.Table.from_pandas(self.violations().to_pandas(), preserve_index=False)
        if len(t) == 0:
            return t
        return t.sort_by(
            [("constraint_id", "ascending"), ("row_ref", "ascending"), ("column", "ascending")]
        )

    def verdicts_table(self) -> pa.Table:
        local = self._local_table()
        if local is not None:
            t = _fold_verdicts_local(local)
        else:
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


# None = one batch per block: parquet-sized blocks are already right,
# and per-block tasks pipeline better than bundled 16k batches
# (measured: 2.8s vs 5.1s for read+validate of 1M rows at 8 cpus).
DEFAULT_BATCH_SIZE = None

# Per-worker-process validator cache for the stateless-task path: the
# first batch a worker sees compiles the spec / fetches broadcast sets,
# later batches reuse it — actor-style state amortization WITHOUT actor
# pools (tasks schedule elastically on any free CPU; measured ~7x
# better utilization than a cold actor pool on short jobs).
_VALIDATOR_CACHE: dict[str, "RowValidator"] = {}


class _TaskValidator:
    """Picklable map_batches callable wrapping the cached RowValidator."""

    def __init__(
        self,
        token: str,
        cset: ConstraintSet,
        broadcast_refs: dict,
        refint_fused: dict[str, list[str]] | None = None,
    ):
        self.token = token
        self.cset = cset
        self.broadcast_refs = broadcast_refs
        self.refint_fused = refint_fused or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _VALIDATOR_CACHE.get(self.token)
        if v is None:
            v = RowValidator(
                cset=self.cset,
                broadcast_refs=self.broadcast_refs,
                refint_fused=self.refint_fused,
            )
            _VALIDATOR_CACHE.clear()  # one live spec per worker is enough
            _VALIDATOR_CACHE[self.token] = v
        return v(batch)


# Parents with more than this many rows are NOT broadcast: validate()
# routes them through the fused anti-join path instead (B5 large-parent
# planner). Override per check with params["max_broadcast_keys"], or
# force a path with params["strategy"] = "broadcast" | "anti_join".
# One shared constant: catalog queries inherit the same guard through
# runtime.broadcast_or_semijoin / runtime.guarded_broadcast.
from .runtime import DEFAULT_MAX_BROADCAST_KEYS  # noqa: E402


def _parent_key_hashes(src, pcols: list[str]) -> np.ndarray:
    """uint64 key hashes for the bloom_screen refint rung (ADVICE r3).

    Dataset parents hash DISTRIBUTED: per-batch local dedup + the same
    cast-to-string / KEY_SEP-join / stable_hash64 convention the
    RowValidator applies to child keys, emitted as uint64 partials —
    the driver only ever concatenates 8 B/key hash arrays, never the
    key strings (the old path materialized every distinct key as a
    Python string on the driver, making bloom's footprint no better
    than the exact set it replaces). List parents are converted to an
    Arrow table first so the cast semantics match the child side.
    """
    from .hashing import KEY_SEP, stable_hash64

    if isinstance(src, list):
        if src and isinstance(src[0], tuple):
            src = pa.table(
                {c: pa.array([v[i] for v in src]) for i, c in enumerate(pcols)}
            )
        else:
            src = pa.table({pcols[0]: pa.array(list(src))})

    def key_strings(t: pa.Table):
        t = t.select(pcols).group_by(pcols, use_threads=False).aggregate([])
        if len(pcols) == 1:
            return pc.cast(t[pcols[0]], pa.string())
        joined = [pc.cast(t[c], pa.string()) for c in pcols]
        return pc.binary_join_element_wise(*joined, KEY_SEP)

    if isinstance(src, pa.Table):
        return np.unique(stable_hash64(key_strings(src)))

    def pre(t: pa.Table) -> pa.Table:
        h = np.unique(stable_hash64(key_strings(t)))
        return pa.table({"h": pa.array(h, type=pa.uint64())})

    parts = ray.get(
        src.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
    )
    arrs = [p["h"].to_numpy(zero_copy_only=False) for p in parts if len(p)]
    if not arrs:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(arrs))


def _distinct_parent_keys(src: "ray.data.Dataset", pcols: list[str]) -> pa.Table:
    """Distinct parent keys, computed DISTRIBUTED-first: per-batch local
    ``group_by`` reduces each block to its distinct keys; only those
    partials reach the driver for the final dedup (never the full parent
    column — the old driver-side ``to_pandas().drop_duplicates()`` was a
    scale hazard)."""

    def pre(t: pa.Table) -> pa.Table:
        return t.select(pcols).group_by(pcols, use_threads=False).aggregate([])

    parts = ray.get(
        src.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
    )
    parts = [p.select(pcols) for p in parts if len(p)]
    if not parts:
        return pa.table({c: pa.array([]) for c in pcols})
    t = pa.concat_tables(parts)
    return t.group_by(pcols, use_threads=False).aggregate([]).select(pcols)


def validate(
    ds: "ray.data.Dataset",
    spec: dict | ConstraintSet,
    *,
    parents: dict[str, "ray.data.Dataset | pa.Table | list"] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = DEFAULT_BATCH_SIZE,
    materialize: bool = True,
    out_dir: str | None = None,
    use_actors: bool = False,
) -> ValidationResult:
    """Run the full ConstraintSet against a Dataset.

    ``parents`` maps refint parent_table name → its key source (Dataset /
    Arrow table / list of keys). The planner picks the B5 execution path
    per check:

    - small parents (≤ ``max_broadcast_keys`` rows, default 2M) are
      broadcast via ``ray.put`` — distinct keys computed distributed
      first — and checked with a vectorized ``pc.is_in`` inside the
      fused row pass (no shuffle);
    - large parents route through the fused anti-join path: the row pass
      emits pre-aggregated child-key partials inline (no second input
      read) and a hash-partitioned ``left_anti`` join against the parent
      keys finds the orphans (constraints_dist.fused_refint_anti_results).
    - ``params["strategy"]`` forces "broadcast" or "anti_join".
    """
    cs = spec if isinstance(spec, ConstraintSet) else compile_table_spec(spec)

    # --- refint planner: broadcast vs fused anti-join, per check ---
    broadcast_refs: dict[str, ray.ObjectRef] = {}
    refint_fused: dict[str, list[str]] = {}
    anti_parents: dict[str, "ray.data.Dataset"] = {}
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
        strategy = dist.params.get("strategy", "auto")
        threshold = int(
            dist.params.get("max_broadcast_keys") or DEFAULT_MAX_BROADCAST_KEYS
        )
        cid = dist.constraint_id

        if strategy == "bloom_screen":
            # opt-in APPROXIMATE screen (the refint rung of the
            # decontam scale ladder): parent keys as a Bloom filter —
            # ~2 B/key broadcast at 16 bits/key vs 8+ B/key for the
            # exact set, for parents that outgrow the broadcast
            # threshold but whose anti-join is too expensive for a
            # quick screen. One-sided: a missing child passes with
            # prob = FPR (~4e-4); flagged violations are always real.
            # Hashing is distributed for Dataset parents and honored
            # for list/table parents too (ADVICE r3: was silently
            # ignored for lists).
            from .ops.decontam import BloomFilter

            bloom = BloomFilter(
                _parent_key_hashes(src, pcols),
                bits_per_key=int(dist.params.get("bits_per_key", 16)),
            )
            broadcast_refs[cid] = ray.put(bloom)
            continue
        if isinstance(src, list):
            if strategy == "anti_join":
                # honor a forced join for list parents too: convert to a
                # one-column (or tuple-exploded) Arrow table and fall
                # through to the Table branch
                if src and isinstance(src[0], tuple):
                    src = pa.table(
                        {c: pa.array([v[i] for v in src]) for i, c in enumerate(pcols)}
                    )
                else:
                    src = pa.table({pcols[0]: pa.array(list(src))})
            else:
                broadcast_refs[cid] = ray.put(set(src))
                continue
        if isinstance(src, pa.Table):
            if strategy == "anti_join" or (strategy == "auto" and len(src) > threshold):
                anti_parents[cid] = ray.data.from_arrow(src.select(pcols))
                refint_fused[cid] = list(dist.params["columns"])
                continue
            keys_t = src.select(pcols).group_by(pcols, use_threads=False).aggregate([])
        else:  # Dataset
            # src.count() is parquet metadata for file-backed parents;
            # for computed parents it executes the (parent) pipeline once.
            if strategy == "anti_join" or (
                strategy == "auto" and src.count() > threshold
            ):
                anti_parents[cid] = src
                refint_fused[cid] = list(dist.params["columns"])
                continue
            keys_t = _distinct_parent_keys(src, pcols)
        if len(pcols) == 1:
            keys = set(keys_t[pcols[0]].to_pylist())
        else:
            keys = set(zip(*(keys_t[c].to_pylist() for c in pcols)))
        broadcast_refs[cid] = ray.put(keys)

    if use_actors:
        # actor-pool path (B7): for expensive per-actor state (huge
        # schemas, model weights); pays pool-startup latency.
        combined = ds.map_batches(
            RowValidator,
            fn_constructor_kwargs={
                "cset": cs,
                "broadcast_refs": broadcast_refs,
                "refint_fused": refint_fused,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 8),
            zero_copy_batch=True,
        )
    else:
        # stateless-task path (default): elastic scheduling, state
        # amortized via the per-process _VALIDATOR_CACHE.
        import uuid

        combined = ds.map_batches(
            _TaskValidator(uuid.uuid4().hex, cs, broadcast_refs, refint_fused),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )

    # --- distributed checks union into the same result stream ---
    # uniqueness + fused-refint consume the key partials the validator
    # emitted inline (EXT_SCHEMA), so the input is read exactly once;
    # the raw stream is materialized first (its key rows are the
    # shuffle's input and would be pinned by the exchange anyway).
    from . import constraints_dist as cd

    raw = combined
    unique_dists = [d for d in cs.dist_checks if d.kind == "unique"]
    if unique_dists or refint_fused:
        raw = raw.materialize()
    combined = raw.map_batches(
        _project_res, batch_format="pyarrow", zero_copy_batch=True
    )
    if unique_dists:
        combined = combined.union(cd.fused_unique_results(raw, cs, unique_dists))
    for dist in cs.dist_checks:
        if dist.kind == "refint" and dist.constraint_id in refint_fused:
            combined = combined.union(
                cd.fused_refint_anti_results(
                    raw, anti_parents[dist.constraint_id], cs, dist
                )
            )
    for dist in cs.dist_checks:
        if dist.kind == "drift":
            # drift re-reads the input for its sketch partials (its own
            # column-pruned pass); fine — sketch columns are narrow
            combined = combined.union(cd.drift_check_results(ds, cs, dist))
        elif dist.kind == "group_drift":
            # per-group sketch pass: exchange is one digest per
            # (group, batch); see drift.group_drift_check_results
            combined = combined.union(cd.group_drift_check_results(ds, cs, dist))
        elif dist.kind == "freshness":
            # O(partitions x groups x batches) partials, one fold task
            combined = combined.union(
                cd.freshness_check_results(ds, cs, dist)
            )
        elif dist.kind == "cardinality":
            # B4-shaped locally-distinct (pid, group, value) exchange +
            # one fold task, see cardinality_check_results
            combined = combined.union(
                cd.cardinality_check_results(ds, cs, dist)
            )
        elif dist.kind == "reconcile":
            # other table resolves from the same parents= mapping refint
            # uses; pa.Table / list sources are wrapped into a Dataset
            src = (parents or {}).get(dist.params["other_table"])
            if src is None:
                raise ValueError(
                    f"reconcile check {dist.constraint_id!r} needs "
                    f"parents[{dist.params['other_table']!r}]"
                )
            if isinstance(src, pa.Table):
                src = ray.data.from_arrow(src)
            elif not hasattr(src, "map_batches"):
                raise ValueError(
                    "reconcile other_table must be a Dataset or pyarrow Table"
                )
            combined = combined.union(
                cd.reconcile_check_results(ds, src, cs, dist)
            )
        elif dist.kind == "monotonic":
            # one key-hash exchange + per-bucket sort/compare, see
            # monotonic_check_results
            combined = combined.union(cd.monotonic_check_results(ds, cs, dist))
        elif dist.kind == "fd":
            # FD re-reads the input column-pruned to det+dep (narrow);
            # one exchange of locally-distinct pairs, see fd_check_results
            combined = combined.union(cd.fd_check_results(ds, cs, dist))
        elif dist.kind == "completeness":
            # global null-rate threshold: O(partitions x batches)
            # partials, one fold task
            combined = combined.union(
                cd.completeness_check_results(ds, cs, dist)
            )
        elif dist.kind == "quantile_bounds":
            # exact-quantile thresholds + one pruned flagging pass
            combined = combined.union(
                cd.quantile_bounds_check_results(ds, cs, dist)
            )

    # A11 schema congruence: plan-time, driver-side (ds.schema() is
    # metadata — no data pass)
    if cs.declared_schema is not None:
        observed = ds.schema().base_schema
        combined = combined.union(
            ray.data.from_arrow(schema_congruence_rows(observed, cs))
        )

    if out_dir is not None:
        combined.write_parquet(out_dir + "/_results")
        combined = ray.data.read_parquet(out_dir + "/_results")
    elif materialize:
        combined = combined.materialize()
    return ValidationResult(combined)
