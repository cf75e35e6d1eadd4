"""Distributed constraints: uniqueness (B4), referential integrity at
scale (B5 anti-join path), drift (B9), salting helpers (B8).

All stages emit pipeline.RESULT_SCHEMA rows so they union into the one
result stream that validate() folds into verdicts.

Shuffle discipline (SURVEY.md "minimize shuffles"): the uniqueness check
never ships full rows — a vectorized per-batch pre-aggregation
(pyarrow ``Table.group_by``) reduces each batch to (key, partition_id,
cnt) partials first, so the ``groupby`` exchange moves one row per
distinct key per batch, not one per input row. The key
(repo,path,commit) is fine-grained and naturally balanced, so the
shuffle keys on it directly; salting (B8) applies to per-*repo*
rollups, provided by ``salted_group_counts``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min, Sum

from .ir import ConstraintSet, DistCheck
from . import pipeline as P

__all__ = [
    "unique_check_results",
    "refint_anti_join_results",
    "fused_refint_anti_results",
    "drift_check_results",
    "group_drift_check_results",
    "fd_check_results",
    "monotonic_check_results",
    "reconcile_check_results",
    "freshness_check_results",
    "cardinality_check_results",
    "completeness_check_results",
    "quantile_bounds_check_results",
    "salted_group_counts",
]


def _key_ref(t: pa.Table, cols: list[str], cs: ConstraintSet) -> list[str]:
    """Canonical row_ref for a key group: the real row_ref template when
    the key IS the row_ref key, else '|'-joined values."""
    if set(cols) == set(cs.row_ref_cols) and cs.row_ref_template:
        return P.build_row_ref(t, cs).to_pylist()
    joined = [pc.fill_null(pc.cast(t[c], pa.string()), "<null>") for c in cols]
    if len(joined) == 1:
        return joined[0].to_pylist()
    return pc.binary_join_element_wise(*joined, "|").to_pylist()


def unique_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """B4: table-wide uniqueness on ``dist.params['columns']``.

    Plan (measured fastest of 5 shuffle formulations at 1M keys / 32
    cpus — 3s vs 27-67s for direct multi/single-column groupby):

    1. map_batches pre-agg: vectorized local ``pyarrow group_by`` per
       batch → one row per distinct key per batch carrying
       ``(k, ref, bucket, partition_id, cnt)``; ``k`` is the exact
       \\x1f-joined key, ``bucket = stable_hash64(k) % B`` (\\x1f, NOT
       \\x00 — pandas siphash truncates at NUL, vald.hashing caveat).
    2. ``groupby("bucket")`` — the all-to-all moves one small-int-keyed
       row per distinct key per batch, nothing else — then a local
       C++ ``group_by(k)`` inside ``map_groups`` finishes the exact
       count per key (equal keys are co-located by the bucket hash).
    3. emit verdict partials + one violation row per duplicate group
       (observed = multiplicity); n_violations = rows in excess of the
       first occurrence → parallelism-invariant verdicts.

    ``num_buckets`` (param) must scale with data: each bucket is one
    map_groups task; default 256, use ~(total_keys / 5M) at scale.
    """
    cols = list(dist.params["columns"])
    cid = dist.constraint_id
    num_buckets = int(dist.params.get("num_buckets", 256))

    pre_schema = pa.schema(
        [
            ("h", pa.uint64()),
            ("ref", pa.string()),
            ("bucket", pa.int32()),
            ("partition_id", pa.int32()),
            ("cnt", pa.int64()),
        ]
    )

    def pre(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pre_schema.empty_table()
        from .hashing import KEY_SEP, stable_hash64

        pids = P.build_partition_ids(t, cs)
        # canonical key string (the violation row_ref) + its 64-bit hash;
        # downstream groups on (h, ref) — the int prefix makes the sort
        # cheap, the ref equality guards against hash collisions.
        if set(cols) == set(cs.row_ref_cols) and cs.row_ref_template:
            ref = P.build_row_ref(t, cs)
        else:
            keys = [pc.fill_null(pc.cast(t[c], pa.string()), "<null>") for c in cols]
            ref = (
                keys[0]
                if len(keys) == 1
                else pc.binary_join_element_wise(*keys, KEY_SEP)
            )
        small = pa.table(
            {
                "ref": ref,
                "partition_id": pa.array(pids, type=pa.int32()),
                "cnt": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        agg = small.group_by("ref", use_threads=False).aggregate(
            [("partition_id", "min"), ("cnt", "sum")]
        )
        agg = agg.rename_columns(["ref", "partition_id", "cnt"])
        h = stable_hash64(agg["ref"])
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "h": pa.array(h, type=pa.uint64()),
                "ref": agg["ref"],
                "bucket": pa.array(bucket),
                "partition_id": agg["partition_id"],
                "cnt": agg["cnt"],
            }
        )

    partials = ds.map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True, batch_size=16384
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        agg = t.group_by(["h", "ref"], use_threads=False).aggregate(
            [("partition_id", "min"), ("cnt", "sum")]
        )
        return agg.rename_columns(["h", "ref", "partition_id", "cnt"])

    counts = partials.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return P._empty_result()
        cnt = np.asarray(t["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pids = np.asarray(t["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        # verdict partials, vectorized per partition via bincount
        Pmax = int(pids.max()) + 1 if len(pids) else 1
        n_checked = np.bincount(pids, weights=cnt, minlength=Pmax)
        excess = np.bincount(pids, weights=(cnt - 1).clip(min=0), minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([""] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend(excess[present].astype(np.int64).tolist())
        dup_idx = np.flatnonzero(cnt > 1)
        if len(dup_idx):
            dup_t = t.take(pa.array(dup_idx, type=pa.int64()))
            refs = dup_t["ref"].to_pylist()
            dup_cnt = cnt[dup_idx]
            dup_pid = pids[dup_idx]
            for i in range(len(dup_idx)):
                out["partition_id"].append(int(dup_pid[i]))
                out["constraint_id"].append(cid)
                out["row_ref"].append(refs[i])
                out["column"].append(",".join(cols))
                out["observed"].append(str(int(dup_cnt[i])))
                out["detail"].append("unique")
                out["is_violation"].append(True)
                out["n_checked"].append(0)
                out["n_violations"].append(0)
        return P.result_rows(out)

    return counts.map_batches(finish, batch_format="pyarrow")


def fused_unique_results(
    raw: "ray.data.Dataset",
    cs: ConstraintSet,
    dists: list[DistCheck],
    max_candidate_broadcast: int = 5_000_000,
) -> "ray.data.Dataset":
    """B4, single-input-pass, HASH-FIRST variant (r2): consumes the
    key-partial rows (``rec == "key"``) that RowValidator emitted inline
    (pipeline EXT_SCHEMA) — uniqueness never re-reads the input — and
    keeps the heavy key strings OUT of the exchange:

    1. **totals, no shuffle**: n_checked verdict partials come straight
       from the partial rows (bincount by partition, weighted by ucnt).
    2. **candidate detection, light shuffle**: only (cid-code:int8,
       uh:uint64, ubucket:int32, ucnt:int64) ≈ 21 B/row moves through
       the groupby — ~6× fewer bytes than shipping the canonical ref
       strings (measured 123 B/row on the 8M corpus). Hashes with total
       count > 1 are duplicate CANDIDATES (true dups ∪ rare collisions).
    3. **refinement**: candidate uh sets are broadcast (ray.put) and the
       materialized raw stream is filtered down to candidate rows only
       (tiny: ~dup-rate × keys); a bucket groupby over THOSE carries the
       refs and produces exact per-key counts, violation rows, and
       n_violations partials — the ref-equality comparison here is the
       hash-collision guard, so verdicts stay exact.

    MEASURED (this sandbox, 1M@32cpu and 8M@8cpu): the hash-first
    duplicate detection is SLOWER end-to-end than the single
    ref-carrying shuffle (54 s vs 38-42 s at 8M/8cpu) — Ray's sort-based
    groupby cost is dominated by ROW count, not bytes, and hash-first
    pays a second shuffle plus two extra passes. It is therefore an
    OPT-IN (``params["unique_strategy"] = "hash_first"``) for regimes
    where per-row key strings are far wider than here (multi-KB refs);
    the default routes duplicate detection through the full shuffle.
    The shuffle-free totals pass below is a pure win and is used for
    BOTH strategies. Falls back to the full shuffle when candidates
    exceed ``max_candidate_broadcast``.

    ``raw`` must be materialized by the caller (validate does)."""
    cid_list = [d.constraint_id for d in dists]
    cid_arr = pa.array(cid_list, type=pa.string())
    hash_first_cids = [
        d.constraint_id
        for d in dists
        if d.params.get("unique_strategy", "full") == "hash_first"
    ]
    full_cids = [c for c in cid_list if c not in hash_first_cids]

    def only_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["rec"], pa.scalar("key")))

    # --- 1. totals: verdict n_checked partials, no shuffle ---
    def totals(t: pa.Table) -> pa.Table:
        t = only_keys(t)
        if len(t) == 0:
            return P._empty_result()
        code = pc.index_in(t["constraint_id"], value_set=cid_arr)
        code_np = np.asarray(code.to_numpy(zero_copy_only=False), dtype=np.int64)
        pids = np.asarray(
            t["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        cnt = np.asarray(t["ucnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        for ci, cid in enumerate(cid_list):
            sel = code_np == ci
            if not sel.any():
                continue
            spids, scnt = pids[sel], cnt[sel]
            Pmax = int(spids.max()) + 1
            n_checked = np.bincount(spids, weights=scnt, minlength=Pmax)
            present = np.flatnonzero(n_checked > 0)
            kp = len(present)
            out["partition_id"].extend(present.tolist())
            out["constraint_id"].extend([cid] * kp)
            out["row_ref"].extend([""] * kp)
            out["column"].extend([""] * kp)
            out["observed"].extend([""] * kp)
            out["detail"].extend([""] * kp)
            out["is_violation"].extend([False] * kp)
            out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
            out["n_violations"].extend([0] * kp)
        return P.result_rows(out)

    totals_ds = raw.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)

    out = totals_ds
    if full_cids:
        out = out.union(_fused_unique_dups_full(raw, full_cids))
    if not hash_first_cids:
        return out
    hf_arr = pa.array(hash_first_cids, type=pa.string())

    # --- 2. light candidate shuffle: hashes only (hash-first cids) ---
    def light(t: pa.Table) -> pa.Table:
        t = only_keys(t)
        t = t.filter(
            pc.fill_null(pc.is_in(t["constraint_id"], value_set=hf_arr), False)
        )
        code = pc.cast(
            pc.index_in(t["constraint_id"], value_set=cid_arr), pa.int8()
        )
        return pa.table(
            {
                "cidc": code,
                "uh": t["uh"],
                "ubucket": t["ubucket"],
                "ucnt": t["ucnt"],
            }
        )

    def cand_bucket(g: pa.Table) -> pa.Table:
        agg = g.group_by(["cidc", "uh"], use_threads=False).aggregate(
            [("ucnt", "sum")]
        )
        agg = agg.rename_columns(["cidc", "uh", "cnt"])
        return agg.filter(pc.greater(agg["cnt"], pa.scalar(1))).select(
            ["cidc", "uh"]
        )

    cands = (
        raw.map_batches(light, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ubucket")
        .map_groups(cand_bucket, batch_format="pyarrow")
        .materialize()
    )
    n_cand = cands.count()
    if n_cand == 0:
        return out
    if n_cand > max_candidate_broadcast:
        # extreme-duplication fallback: ship refs through the shuffle
        return out.union(_fused_unique_dups_full(raw, hash_first_cids))

    cand_t = pa.concat_tables(
        [p for p in ray.get(cands.to_arrow_refs()) if len(p)]
    )
    cand_sets: dict[int, pa.Array] = {}
    codes = np.asarray(cand_t["cidc"].to_numpy(zero_copy_only=False), dtype=np.int64)
    uhs = cand_t["uh"].combine_chunks()
    for ci in range(len(cid_list)):
        sel = np.flatnonzero(codes == ci)
        if len(sel):
            cand_sets[ci] = uhs.take(pa.array(sel, type=pa.int64()))
    cand_ref = ray.put(cand_sets)

    # --- 3. refinement: candidate rows only, WITH refs ---
    def refine_filter(t: pa.Table) -> pa.Table:
        t = only_keys(t)
        sets = ray.get(cand_ref)
        code = pc.index_in(t["constraint_id"], value_set=cid_arr)
        mask = np.zeros(len(t), dtype=bool)
        code_np = np.asarray(code.to_numpy(zero_copy_only=False), dtype=np.int64)
        for ci, uh_set in sets.items():
            m = pc.fill_null(pc.is_in(t["uh"], value_set=uh_set), False)
            mask |= np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool) & (
                code_np == ci
            )
        t = t.filter(pa.array(mask))
        return t.select(
            ["constraint_id", "uh", "ubucket", "row_ref", "partition_id", "ucnt"]
        )

    def refine_bucket(g: pa.Table) -> pa.Table:
        agg = g.group_by(
            ["constraint_id", "uh", "row_ref"], use_threads=False
        ).aggregate([("partition_id", "min"), ("ucnt", "sum")])
        agg = agg.rename_columns(
            ["constraint_id", "uh", "row_ref", "partition_id", "cnt"]
        )
        cnt = np.asarray(agg["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        dup_idx = np.flatnonzero(cnt > 1)
        if len(dup_idx) == 0:
            return P._empty_result()
        dup = agg.take(pa.array(dup_idx, type=pa.int64()))
        cids = dup["constraint_id"].to_pylist()
        refs = dup["row_ref"].to_pylist()
        pids = np.asarray(
            dup["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        dcnt = cnt[dup_idx]
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        # n_violations partials per (cid, pid): excess occurrences
        for cid in sorted(set(cids)):
            sel = np.array([c == cid for c in cids])
            spids = pids[sel]
            Pmax = int(spids.max()) + 1
            excess = np.bincount(spids, weights=(dcnt[sel] - 1), minlength=Pmax)
            present = np.flatnonzero(excess > 0)
            kp = len(present)
            out["partition_id"].extend(present.tolist())
            out["constraint_id"].extend([cid] * kp)
            out["row_ref"].extend([""] * kp)
            out["column"].extend([""] * kp)
            out["observed"].extend([""] * kp)
            out["detail"].extend([""] * kp)
            out["is_violation"].extend([False] * kp)
            out["n_checked"].extend([0] * kp)
            out["n_violations"].extend(excess[present].astype(np.int64).tolist())
        for i in range(len(dup_idx)):
            out["partition_id"].append(int(pids[i]))
            out["constraint_id"].append(cids[i])
            out["row_ref"].append(refs[i])
            out["column"].append("")
            out["observed"].append(str(int(dcnt[i])))
            out["detail"].append("unique")
            out["is_violation"].append(True)
            out["n_checked"].append(0)
            out["n_violations"].append(0)
        return P.result_rows(out)

    refined = (
        raw.map_batches(refine_filter, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ubucket")
        .map_groups(refine_bucket, batch_format="pyarrow")
    )
    return out.union(refined)


def _fused_unique_dups_full(
    raw: "ray.data.Dataset", cid_list: list[str]
) -> "ray.data.Dataset":
    """Extreme-duplication fallback: duplicate detection with refs
    carried through the shuffle (the r1 plan, minus the totals, which
    the hash-first path already emitted shuffle-free)."""

    cid_arr = pa.array(cid_list, type=pa.string())

    def project_key(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["rec"], pa.scalar("key")))
        t = t.filter(
            pc.fill_null(pc.is_in(t["constraint_id"], value_set=cid_arr), False)
        )
        return t.select(
            ["constraint_id", "row_ref", "partition_id", "uh", "ubucket", "ucnt"]
        )

    keys = raw.map_batches(project_key, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(g: pa.Table) -> pa.Table:
        agg = g.group_by(["constraint_id", "uh", "row_ref"], use_threads=False).aggregate(
            [("partition_id", "min"), ("ucnt", "sum")]
        )
        agg = agg.rename_columns(
            ["constraint_id", "uh", "row_ref", "partition_id", "cnt"]
        )
        if len(agg) == 0:
            return P._empty_result()
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        cids = agg["constraint_id"].to_numpy(zero_copy_only=False)
        cnt = np.asarray(agg["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pids = np.asarray(
            agg["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        refs = agg["row_ref"]
        # n_checked partials were already emitted shuffle-free by the
        # hash-first totals pass — this fallback adds ONLY the excess
        for cid in np.unique(cids):
            sel = cids == cid
            scnt, spids = cnt[sel], pids[sel]
            Pmax = int(spids.max()) + 1 if len(spids) else 1
            excess = np.bincount(spids, weights=(scnt - 1).clip(min=0), minlength=Pmax)
            present = np.flatnonzero(excess > 0)
            kp = len(present)
            out["partition_id"].extend(present.tolist())
            out["constraint_id"].extend([str(cid)] * kp)
            out["row_ref"].extend([""] * kp)
            out["column"].extend([""] * kp)
            out["observed"].extend([""] * kp)
            out["detail"].extend([""] * kp)
            out["is_violation"].extend([False] * kp)
            out["n_checked"].extend([0] * kp)
            out["n_violations"].extend(excess[present].astype(np.int64).tolist())
        dup_idx = np.flatnonzero(cnt > 1)
        if len(dup_idx):
            dup_refs = refs.take(pa.array(dup_idx, type=pa.int64())).to_pylist()
            for j, i in enumerate(dup_idx):
                out["partition_id"].append(int(pids[i]))
                out["constraint_id"].append(str(cids[i]))
                out["row_ref"].append(dup_refs[j])
                out["column"].append("")
                out["observed"].append(str(int(cnt[i])))
                out["detail"].append("unique")
                out["is_violation"].append(True)
                out["n_checked"].append(0)
                out["n_violations"].append(0)
        return P.result_rows(out)

    return keys.groupby("ubucket").map_groups(per_bucket, batch_format="pyarrow")


def refint_anti_join_results(
    child: "ray.data.Dataset",
    parent: "ray.data.Dataset",
    cs: ConstraintSet,
    dist: DistCheck,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """B5 large-parent path: native hash-partitioned ``left_anti`` join
    (Ray 2.49.2 ``Dataset.join``, JoinType left_anti verified) on
    pre-aggregated child keys. Used when the parent key set is too big
    to broadcast; the broadcast path lives in RowValidator.

    Child keys are pre-aggregated per batch (key, partition_id, cnt)
    before the join, so the exchange moves distinct keys, not rows.
    """
    cols = list(dist.params["columns"])
    pcols = list(dist.params.get("parent_columns", cols))
    cid = dist.constraint_id
    from .runtime import join_barrier, join_partitions, join_remote_args

    P_parts = join_partitions(num_partitions or cs.num_partitions)

    def pre(t: pa.Table) -> pa.Table:
        pids = P.build_partition_ids(t, cs)
        small = t.select(cols).append_column("partition_id", pa.array(pids, type=pa.int32()))
        # refint never checks null keys — drop them before the shuffle
        valid = np.ones(len(t), dtype=bool)
        for c in cols:
            valid &= ~np.asarray(pc.is_null(t[c]).to_numpy(zero_copy_only=False), dtype=bool)
        small = small.filter(pa.array(valid))
        small = small.append_column("cnt", pa.array(np.ones(len(small), dtype=np.int64)))
        agg = small.group_by(cols, use_threads=False).aggregate(
            [("partition_id", "min"), ("cnt", "sum")]
        )
        return agg.rename_columns(cols + ["partition_id", "cnt"])

    child_keys = child.map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True, batch_size=16384
    )
    child_keys = child_keys.groupby(cols).aggregate(
        Sum("cnt", alias_name="cnt"), Min("partition_id", alias_name="partition_id")
    )
    parent_keys = parent.select_columns(pcols)
    # join_barrier: child_keys is a groupby output — see runtime.join_barrier
    missing = join_barrier(child_keys).join(
        parent_keys,
        join_type="left_anti",
        num_partitions=P_parts,
        on=tuple(cols),
        right_on=tuple(pcols) if pcols != cols else None,
        aggregator_ray_remote_args=join_remote_args(),
    )

    # total checked = all child non-null keys; computed from child_keys
    def totals(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return P._empty_result()
        valid = np.ones(len(t), dtype=bool)
        for c in cols:
            valid &= ~np.asarray(pc.is_null(t[c]).to_numpy(zero_copy_only=False), dtype=bool)
        cnt = np.asarray(t["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pids = np.asarray(t["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        for pid in np.unique(pids):
            sel = (pids == pid) & valid
            out["partition_id"].append(int(pid))
            out["constraint_id"].append(cid)
            out["row_ref"].append("")
            out["column"].append("")
            out["observed"].append("")
            out["detail"].append("")
            out["is_violation"].append(False)
            out["n_checked"].append(int(cnt[sel].sum()))
            out["n_violations"].append(0)
        return P.result_rows(out)

    def missing_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return P._empty_result()
        valid = np.ones(len(t), dtype=bool)
        for c in cols:
            valid &= ~np.asarray(pc.is_null(t[c]).to_numpy(zero_copy_only=False), dtype=bool)
        t = t.filter(pa.array(valid))
        if len(t) == 0:
            return P._empty_result()
        refs = _key_ref(t, cols, cs)
        cnt = np.asarray(t["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pids = np.asarray(
            t["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        # per-partition n_violations via one bincount (same formulation
        # as fused_refint_anti_results, VERDICT r2 item 7)
        nv = np.bincount(pids, weights=cnt, minlength=int(pids.max()) + 1)
        present = np.flatnonzero(nv > 0)
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([""] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend([0] * kp)
        out["n_violations"].extend(nv[present].astype(np.int64).tolist())
        colnames = ",".join(cols)
        for i in range(len(t)):
            out["partition_id"].append(int(pids[i]))
            out["constraint_id"].append(cid)
            out["row_ref"].append(refs[i])
            out["column"].append(colnames)
            out["observed"].append(str(int(cnt[i])))
            out["detail"].append("refint")
            out["is_violation"].append(True)
            out["n_checked"].append(0)
            out["n_violations"].append(0)
        return P.result_rows(out)

    return child_keys.map_batches(totals, batch_format="pyarrow").union(
        missing.map_batches(missing_rows, batch_format="pyarrow")
    )


def fused_refint_anti_results(
    raw: "ray.data.Dataset",
    parent: "ray.data.Dataset",
    cs: ConstraintSet,
    dist: DistCheck,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """B5 large-parent path, single-input-pass variant: consumes the
    pre-aggregated child-key partials (``rec == "rkey"``) that
    RowValidator emitted inline, so the anti-join NEVER re-reads the
    child input (Ray 2.49 has no projection pushdown — a second consumer
    of the read would re-decode every column, including the wide content
    column). Chosen automatically by ``validate()`` when the parent
    exceeds ``max_broadcast_keys``.

    Plan: rkey partials → totals (verdict n_checked, no shuffle) and, in
    parallel, bucket groupby → per-bucket distinct child keys →
    hash-partitioned ``left_anti`` join against the parent's canonical
    key strings → violation rows. The join moves distinct KEYS on both
    sides, never child rows; skew on hot parents is bounded because the
    child side is already reduced to one row per distinct key.
    """
    cid = dist.constraint_id
    cols = list(dist.params["columns"])
    pcols = list(dist.params.get("parent_columns", cols))
    from .runtime import join_barrier, join_partitions, join_remote_args

    P_parts = join_partitions(num_partitions or cs.num_partitions)
    from .hashing import KEY_SEP

    def project_rkey(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(t["rec"], pa.scalar("rkey")),
            pc.equal(t["constraint_id"], pa.scalar(cid)),
        )
        return t.filter(m).select(
            ["row_ref", "partition_id", "uh", "ubucket", "ucnt"]
        )

    keys = raw.map_batches(project_rkey, batch_format="pyarrow", zero_copy_batch=True)

    def totals(t: pa.Table) -> pa.Table:
        # verdict n_checked partials straight from the (pre-distinct)
        # partials — sums are exact, no shuffle needed
        if len(t) == 0:
            return P._empty_result()
        pids = np.asarray(t["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cnt = np.asarray(t["ucnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        Pmax = int(pids.max()) + 1 if len(pids) else 1
        n_checked = np.bincount(pids, weights=cnt, minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        kp = len(present)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([""] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend([0] * kp)
        return P.result_rows(out)

    totals_ds = keys.map_batches(totals, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        agg = g.group_by(["uh", "row_ref"], use_threads=False).aggregate(
            [("partition_id", "min"), ("ucnt", "sum")]
        )
        agg = agg.rename_columns(["uh", "ref", "partition_id", "cnt"])
        return agg.select(["ref", "partition_id", "cnt"])

    child_keys = keys.groupby("ubucket").map_groups(per_bucket, batch_format="pyarrow")

    def parent_pre(t: pa.Table) -> pa.Table:
        # canonical parent key string, local distinct — the join's right
        # side moves one row per distinct parent key per block
        joined = [pc.cast(t[c], pa.string()) for c in pcols]
        ref = joined[0] if len(joined) == 1 else pc.binary_join_element_wise(*joined, KEY_SEP)
        small = pa.table({"ref": ref}).drop_null()
        return small.group_by("ref", use_threads=False).aggregate([])

    parent_keys = parent.map_batches(
        parent_pre, batch_format="pyarrow", zero_copy_batch=True
    )

    # join_barrier: child_keys is a groupby output — see runtime.join_barrier
    missing = join_barrier(child_keys).join(
        parent_keys,
        join_type="left_anti",
        num_partitions=P_parts,
        on=("ref",),
        aggregator_ray_remote_args=join_remote_args(),
    )

    def missing_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return P._empty_result()
        pids = np.asarray(t["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cnt = np.asarray(t["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        refs = t["ref"].to_pylist()
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        Pmax = int(pids.max()) + 1 if len(pids) else 1
        n_bad = np.bincount(pids, weights=cnt, minlength=Pmax)
        present = np.flatnonzero(n_bad > 0)
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([""] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend([0] * kp)
        out["n_violations"].extend(n_bad[present].astype(np.int64).tolist())
        for i in range(len(t)):
            out["partition_id"].append(int(pids[i]))
            out["constraint_id"].append(cid)
            out["row_ref"].append(refs[i])
            out["column"].append(",".join(cols))
            out["observed"].append(str(int(cnt[i])))
            out["detail"].append("refint")
            out["is_violation"].append(True)
            out["n_checked"].append(0)
            out["n_violations"].append(0)
        return P.result_rows(out)

    return totals_ds.union(missing.map_batches(missing_rows, batch_format="pyarrow"))


def drift_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """B9: per-partition KS/PSI drift vs a baseline profile — delegates
    to vald.drift (needs sketches)."""
    from . import drift

    return drift.drift_check_results(ds, cs, dist)


def group_drift_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """Per-group KS/PSI drift (``kind: group_drift``) — delegates to
    vald.drift (needs sketches)."""
    from . import drift

    return drift.group_drift_check_results(ds, cs, dist)


def completeness_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """Completeness check (``kind: completeness``, Deequ's
    ``completeness(col) >= c``): the column may be null in at most
    ``max_null_rate`` of rows. Unlike ``required`` (zero-null strict,
    a ROW check), the decision is a GLOBAL aggregate: per batch one
    (partition_id, n, n_null) partial row ships (NaN counts as null for
    float columns — the kernel NaN policy), a single tiny groupby merges
    them, and one fold task applies the threshold to the GLOBAL rate —
    per-partition RESULT rows keep exact attribution (a partition's
    n_violations is its own null count) while pass/fail is decided on
    the table-wide rate, so verdicts are parallelism-invariant.
    """
    col = dist.params["column"]
    max_rate = float(dist.params["max_null_rate"])
    cid = dist.constraint_id

    part_schema = pa.schema(
        [("partition_id", pa.int32()), ("n", pa.int64()), ("n_null", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        pids = np.asarray(P.build_partition_ids(t, cs), dtype=np.int64)
        c = t[col]
        if pa.types.is_floating(c.type):
            v = c.to_numpy(zero_copy_only=False).astype(np.float64)
            nulls = np.isnan(v)
        else:
            nulls = pc.is_null(c).to_numpy(zero_copy_only=False)
        Pmax = int(pids.max()) + 1
        n = np.bincount(pids, minlength=Pmax)
        n_null = np.bincount(pids[nulls], minlength=Pmax)
        present = np.flatnonzero(n > 0)
        return pa.Table.from_arrays(
            [
                pa.array(present.astype(np.int32)),
                pa.array(n[present].astype(np.int64)),
                pa.array(n_null[present].astype(np.int64)),
            ],
            schema=part_schema,
        )

    def fold(t: pa.Table) -> pa.Table:
        # t: one row per (partition, batch) — tiny; merge + decide
        agg = (
            t.group_by("partition_id", use_threads=False)
            .aggregate([("n", "sum"), ("n_null", "sum")])
            .rename_columns(["partition_id", "n", "n_null"])
        )
        n_tot = int(pc.sum(agg["n"]).as_py() or 0)
        null_tot = int(pc.sum(agg["n_null"]).as_py() or 0)
        rate = (null_tot / n_tot) if n_tot else 0.0
        firing = rate > max_rate
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        for i in range(len(agg)):
            # count partials: is_violation=False rows carry the verdict
            # numbers (the fold convention — violation rows are
            # exemplars only and are filtered out of verdict sums)
            pid = agg["partition_id"][i].as_py()
            n_p = agg["n"][i].as_py()
            nn_p = agg["n_null"][i].as_py()
            out["partition_id"].append(pid)
            out["constraint_id"].append(cid)
            out["row_ref"].append("")
            out["column"].append(col)
            out["observed"].append(f"{rate:.6f}")
            out["detail"].append(
                f"null_rate>{max_rate}" if firing else f"null_rate<={max_rate}"
            )
            out["is_violation"].append(False)
            out["n_checked"].append(n_p)
            out["n_violations"].append(nn_p if firing else 0)
        if firing:
            # one exemplar row for the table-wide breach, attributed to
            # the partition contributing the most nulls (ADVICE r3:
            # a hardcoded 0 could point at a partition with zero nulls
            # or one that doesn't exist; FD/unique exemplars attribute
            # to a real contributing partition)
            nn = agg["n_null"].to_numpy(zero_copy_only=False)
            worst = int(agg["partition_id"][int(np.argmax(nn))].as_py())
            out["partition_id"].append(worst)
            out["constraint_id"].append(cid)
            out["row_ref"].append("")
            out["column"].append(col)
            out["observed"].append(f"{rate:.6f}")
            out["detail"].append(f"null_rate>{max_rate}")
            out["is_violation"].append(True)
            out["n_checked"].append(0)
            out["n_violations"].append(0)
        return P.result_rows(out)

    cols_needed = list(dict.fromkeys([col] + _pid_cols(cs)))
    partials = ds.map_batches(
        lambda t, c=cols_needed: t.select([x for x in c if x in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # single fold task: the partial stream is O(partitions x batches)
    return partials.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


def quantile_bounds_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """Empirical-outlier screen (``kind: quantile_bounds``): rows whose
    value falls outside the table's own exact [P(lower_q), P(upper_q)]
    quantiles. Two passes:

    1. ``aggregates.exact_quantiles`` pins the two scalar thresholds —
       EXACT histogram-narrowing selection (no sort, no O(n) reduce
       materialization), deterministic and parallelism-invariant (a
       t-digest merge's centroids depend on partition order; the §5.3
       sketch twin remains the accept-threshold-jitter alternative,
       documented trade).
    2. One pruned streaming pass flags out-of-bound rows: per-partition
       (n_checked, n_violations) partials + capped exemplars. NULL/NaN
       values are unchecked (the quantile ignores them too).
    """
    col = dist.params["column"]
    lo_q = float(dist.params["lower_q"])
    hi_q = float(dist.params["upper_q"])
    cid = dist.constraint_id
    max_rows = int(
        dist.params.get("max_violation_rows") or P.DEFAULT_MAX_VIOLATIONS_PER_BATCH
    )

    pruned_cols = list(
        dict.fromkeys([col] + _pid_cols(cs) + list(cs.row_ref_cols or []))
    )
    pruned = ds.map_batches(
        lambda t, c=pruned_cols: t.select([x for x in c if x in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from .aggregates import exact_quantiles

    res = exact_quantiles(ds, col, [lo_q, hi_q])
    lo, hi = res[lo_q], res[hi_q]

    def flag(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return P._empty_result()
        pids = np.asarray(P.build_partition_ids(t, cs), dtype=np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        checked = ~np.isnan(v)
        if lo is None or hi is None:  # all-null column: nothing checked
            bad = np.zeros(len(v), dtype=bool)
        else:
            with np.errstate(invalid="ignore"):
                bad = checked & ((v < lo) | (v > hi))
        Pmax = int(pids.max()) + 1
        n_checked = np.bincount(pids[checked], minlength=Pmax)
        n_viol = np.bincount(pids[bad], minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([col] * kp)
        out["observed"].extend([f"[{lo},{hi}]"] * kp)
        out["detail"].extend([f"q[{lo_q},{hi_q}]"] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend(n_viol[present].astype(np.int64).tolist())
        idx = np.flatnonzero(bad)[:max_rows]
        if len(idx):
            ref = P.build_row_ref(t, cs)
            refs = (
                [""] * len(idx)
                if ref is None
                else [
                    "<null>" if r is None else r
                    for r in ref.take(pa.array(idx, type=pa.int64())).to_pylist()
                ]
            )
            for j, i in enumerate(idx):
                out["partition_id"].append(int(pids[i]))
                out["constraint_id"].append(cid)
                out["row_ref"].append(refs[j])
                out["column"].append(col)
                out["observed"].append(repr(float(v[i])))
                out["detail"].append("quantile_bounds")
                out["is_violation"].append(True)
                out["n_checked"].append(0)
                out["n_violations"].append(0)
        return P.result_rows(out)

    return pruned.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def fd_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """Functional-dependency check (``kind: fd``): every determinant
    value must map to exactly one dependent value (Deequ-style
    "A determines B"). A row violates when its determinant group holds
    ≥ 2 distinct dependent values.

    Same one-exchange shape as ``unique_check_results`` (the measured
    winner there): per batch, rows collapse to locally-distinct
    ``(det-ref, dep, partition_id) -> cnt`` via one Arrow
    hash-aggregate, bucketed on the determinant hash so a determinant's
    pairs land in ONE combine task. Inside the combine: exact pair
    counts, per-determinant distinct-dependent count, then

    - ``n_checked`` partials per partition = sum of cnt (exact per-pid
      attribution: the pid rides every pair row, the advice-r2 rule),
    - ``n_violations`` partials per partition = rows whose determinant
      is inconsistent,
    - one capped exemplar violation row per bad determinant
      (observed = distinct-dependent count, detail = "fd").

    NULL policy: rows with NULL determinant or NULL dependent are
    excluded from both counts (COUNT(DISTINCT) semantics; the oracle
    filters the same way). ``num_buckets`` scales like B4
    (~distinct determinants / 5M).
    """
    from .hashing import KEY_SEP, stable_hash64

    det = list(dist.params["columns"])
    dep = dist.params["dependent"]
    cid = dist.constraint_id
    num_buckets = int(dist.params.get("num_buckets", 256))
    max_rows = int(
        dist.params.get("max_violation_rows") or P.DEFAULT_MAX_VIOLATIONS_PER_BATCH
    )

    pre_schema = pa.schema(
        [
            ("ref", pa.string()),
            ("dep", pa.string()),
            ("bucket", pa.int32()),
            ("partition_id", pa.int32()),
            ("cnt", pa.int64()),
        ]
    )

    def pre(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pre_schema.empty_table()
        pids = P.build_partition_ids(t, cs)
        keys = [pc.cast(t[c], pa.string()) for c in det]
        ref = keys[0] if len(keys) == 1 else pc.binary_join_element_wise(*keys, KEY_SEP)
        small = pa.table(
            {
                "ref": ref,
                "dep": pc.cast(t[dep], pa.string()),
                "partition_id": pa.array(pids, type=pa.int32()),
                "cnt": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).drop_null()  # NULL det or dep rows are unchecked
        agg = (
            small.group_by(["ref", "dep", "partition_id"], use_threads=False)
            .aggregate([("cnt", "sum")])
            .rename_columns(["ref", "dep", "partition_id", "cnt"])
        )
        bucket = stable_hash64(agg["ref"]) % np.uint64(num_buckets)
        return agg.append_column(
            "bucket", pa.array(bucket.astype(np.int32))
        ).select(pre_schema.names)

    def per_bucket(g: pa.Table) -> pa.Table:
        trip = (
            g.group_by(["ref", "dep", "partition_id"], use_threads=False)
            .aggregate([("cnt", "sum")])
            .rename_columns(["ref", "dep", "partition_id", "cnt"])
        )
        if len(trip) == 0:
            return P._empty_result()
        # distinct dependents per determinant (over the pair set)
        pairs = (
            trip.group_by(["ref", "dep"], use_threads=False)
            .aggregate([])
        )
        ndep = (
            pairs.group_by(["ref"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["ref", "n_dep"])
        )
        bad = ndep.filter(pc.greater_equal(ndep["n_dep"], pa.scalar(2)))
        bad_mask = pc.fill_null(
            pc.is_in(trip["ref"], value_set=bad["ref"].combine_chunks()), False
        )
        pids = np.asarray(
            trip["partition_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        cnt = np.asarray(trip["cnt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        badv = bad_mask.to_numpy(zero_copy_only=False)
        Pmax = int(pids.max()) + 1
        n_checked = np.bincount(pids, weights=cnt, minlength=Pmax)
        n_viol = np.bincount(pids[badv], weights=cnt[badv], minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([""] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend(n_viol[present].astype(np.int64).tolist())
        # capped exemplars: one row per inconsistent determinant,
        # attributed to the min contributing partition (the
        # unique-check exemplar convention)
        n_ex = min(len(bad), max_rows)
        if n_ex:
            minpid = (
                trip.group_by("ref", use_threads=False)
                .aggregate([("partition_id", "min")])
                .rename_columns(["ref", "minpid"])
            )
            pid_of = dict(
                zip(minpid["ref"].to_pylist(), minpid["minpid"].to_pylist())
            )
            refs = bad["ref"].to_pylist()[:n_ex]
            ndeps = bad["n_dep"].to_pylist()[:n_ex]
            out["partition_id"].extend([int(pid_of[r]) for r in refs])
            out["constraint_id"].extend([cid] * n_ex)
            out["row_ref"].extend(refs)
            out["column"].extend([dep] * n_ex)
            out["observed"].extend([str(v) for v in ndeps])
            out["detail"].extend(["fd"] * n_ex)
            out["is_violation"].extend([True] * n_ex)
            out["n_checked"].extend([0] * n_ex)
            out["n_violations"].extend([0] * n_ex)
        return P.result_rows(out)

    cols_needed = list(dict.fromkeys(det + [dep] + _pid_cols(cs)))
    pruned = ds.map_batches(
        lambda t, c=cols_needed: t.select([x for x in c if x in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        pruned.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _pid_cols(cs: ConstraintSet) -> list[str]:
    return [cs.partition_by] if cs.partition_by else []


def salted_group_counts(
    ds: "ray.data.Dataset",
    key: str,
    num_salts: int = 16,
) -> "ray.data.Dataset":
    """B8 demonstration primitive: two-phase salted count per hot key.

    Phase 1 groups on (key, salt) — spreading a hot key over
    ``num_salts`` reducers — phase 2 groups the tiny partials on key.
    Used by per-repo rollups where a single giant repo would serialize
    a direct groupby(key).
    """

    def add_salt(t: pa.Table) -> pa.Table:
        n = len(t)
        salt = np.arange(n, dtype=np.int64) % num_salts
        small = t.select([key]).append_column("salt", pa.array(salt))
        small = small.append_column("cnt", pa.array(np.ones(n, dtype=np.int64)))
        return small.group_by([key, "salt"], use_threads=False).aggregate([("cnt", "sum")]).rename_columns([key, "salt", "cnt"])

    phase1 = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    phase1 = phase1.groupby([key, "salt"]).aggregate(Sum("cnt", alias_name="cnt"))
    return phase1.groupby(key).aggregate(Sum("cnt", alias_name="cnt"))


def monotonic_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """Ordering-invariant check (``kind: monotonic``): within each key,
    in (order…) ascending order, ``column`` must never step the wrong
    way vs its predecessor (non-strict ``increasing``: violation =
    value < previous; ``strict`` also flags ties; ``decreasing``
    mirrors) — "balance never decreases per account", "version only
    moves forward per repo".

    Shape: one key-hash exchange of the PARTICIPATING columns only
    (key, order, value, partition id, row_ref — a sequence property
    needs the rows; no partial aggregation exists), then per bucket one
    Arrow sort + one vectorized slice-compare
    (``ops.stats.monotonic_flags``, shared with the standalone op).
    Per-partition attribution is exact: the partition id rides each
    row, n_checked/n_violations come from one ``np.bincount`` each.
    Capped exemplars carry the violating row's row_ref and observed
    (prev -> value) transition. NULL key/order/value rows are excluded
    from both counts (SQL LAG-filter semantics). ``num_buckets``
    follows the B4 data-scaled rule."""
    from .ops.stats import monotonic_flags

    key_cols = list(dist.params["key"])
    order_cols = list(dist.params["order"])
    col = dist.params["column"]
    strict = bool(dist.params.get("strict", False))
    direction = dist.params.get("direction", "increasing")
    increasing = direction == "increasing"
    cid = dist.constraint_id
    num_buckets = int(dist.params.get("num_buckets", 256))
    max_rows = int(
        dist.params.get("max_violation_rows") or P.DEFAULT_MAX_VIOLATIONS_PER_BATCH
    )

    data_cols = list(dict.fromkeys([*key_cols, *order_cols, col]))

    def pre(t: pa.Table) -> pa.Table:
        pids = P.build_partition_ids(t, cs)
        ref = P.build_row_ref(t, cs)
        small = t.select(data_cols).append_column(
            "__pid", pa.array(np.asarray(pids, dtype=np.int32))
        )
        small = small.append_column(
            "__ref",
            pc.fill_null(ref, "<null>")
            if ref is not None
            else pa.nulls(len(t), pa.string()),
        )
        m = None
        for c in data_cols:
            v = pc.is_valid(small[c])
            m = v if m is None else pc.and_(m, v)
        small = small.filter(m)
        h = np.zeros(len(small), dtype=np.uint64)
        mix = np.uint64(0x9E3779B97F4A7C15)
        import pandas as pd

        for kc in key_cols:
            arr = small[kc].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                h = h * mix + pd.util.hash_array(arr, categorize=False)
        return small.append_column(
            "__gb", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__gb"])
        if len(g) == 0:
            return P._empty_result()
        g, viol = monotonic_flags(
            g, key_cols, order_cols, col, strict=strict, increasing=increasing
        )
        pids = np.asarray(
            g["__pid"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        Pmax = int(pids.max()) + 1
        n_checked = np.bincount(pids, minlength=Pmax)
        n_viol = np.bincount(pids[viol], minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([col] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend(n_viol[present].astype(np.int64).tolist())
        idx = np.flatnonzero(viol)[:max_rows]
        if len(idx):
            take = pa.array(idx, type=pa.int64())
            prev_take = pa.array(idx - 1, type=pa.int64())
            refs = g["__ref"].take(take).to_pylist()
            vals = pc.cast(g[col], pa.string()).take(take).to_pylist()
            prevs = pc.cast(g[col], pa.string()).take(prev_take).to_pylist()
            for j, i in enumerate(idx):
                out["partition_id"].append(int(pids[i]))
                out["constraint_id"].append(cid)
                out["row_ref"].append(refs[j] if refs[j] is not None else "")
                out["column"].append(col)
                out["observed"].append(f"{prevs[j]} -> {vals[j]}")
                out["detail"].append(
                    f"monotonic[{direction}{',strict' if strict else ''}]"
                )
                out["is_violation"].append(True)
                out["n_checked"].append(0)
                out["n_violations"].append(0)
        return P.result_rows(out)

    cols_needed = list(
        dict.fromkeys(data_cols + _pid_cols(cs) + list(cs.row_ref_cols or []))
    )
    pruned = ds.map_batches(
        lambda t, c=cols_needed: t.select([x for x in c if x in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        pruned.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def reconcile_check_results(
    ds: "ray.data.Dataset",
    other: "ray.data.Dataset",
    cs: ConstraintSet,
    dist: DistCheck,
) -> "ray.data.Dataset":
    """Cross-table reconciliation check (``kind: reconcile``): each
    validated row's ``column`` must equal ``sum(other_sum)`` over the
    ``other_table`` rows sharing its key, within ``tolerance`` — the
    accounting consistency neither refint (existence) nor FD
    (functional shape) expresses. ``other`` resolves from the same
    ``parents=`` mapping refint uses.

    Shape: the other table never ships rows — per-batch per-key partial
    sums only; the validated side ships (key, value, partition id,
    row_ref). ONE hash exchange co-locates a key's partials with its
    rows; per bucket one Arrow hash-aggregate + hash-join, then
    vectorized compare + ``np.bincount`` per-partition attribution.
    NULL key/value rows are excluded (unchecked); a key with NO other
    rows fails reconciliation (``missing_other: "ignore"`` downgrades
    it to unchecked). Capped exemplars carry row_ref and the
    ``value != sum`` pair."""
    import pandas as pd

    key = dist.params["key"]
    col = dist.params["column"]
    okey = dist.params["other_key"]
    osum = dist.params["other_sum"]
    tol = float(dist.params.get("tolerance", 0.01))
    missing_viol = dist.params.get("missing_other", "violation") == "violation"
    cid = dist.constraint_id
    num_buckets = int(dist.params.get("num_buckets", 256))
    max_rows = int(
        dist.params.get("max_violation_rows") or P.DEFAULT_MAX_VIOLATIONS_PER_BATCH
    )
    mix_mod = np.uint64(num_buckets)

    def _bucket(k: "pa.ChunkedArray") -> np.ndarray:
        arr = k.to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = pd.util.hash_array(arr, categorize=False)
        return (h % mix_mod).astype(np.int32)

    def other_partial(t: pa.Table) -> pa.Table:
        small = pa.table(
            {
                "key": pc.cast(t[okey], pa.string()),
                "val": pc.cast(t[osum], pa.float64()),
            }
        ).drop_null()
        agg = (
            small.group_by(["key"], use_threads=False)
            .aggregate([("val", "sum")])
            .rename_columns(["key", "val"])
        )
        n = len(agg)
        return pa.table(
            {
                "__b": pa.array(_bucket(agg["key"])),
                "key": agg["key"],
                "val": agg["val"],
                "__pid": pa.array(np.full(n, -1, dtype=np.int32)),
                "__ref": pa.nulls(n, pa.string()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def parent_partial(t: pa.Table) -> pa.Table:
        pids = P.build_partition_ids(t, cs)
        ref = P.build_row_ref(t, cs)
        small = pa.table(
            {
                "key": pc.cast(t[key], pa.string()),
                "val": pc.cast(t[col], pa.float64()),
                "__pid": pa.array(np.asarray(pids, dtype=np.int32)),
                "__ref": pc.fill_null(ref, "<null>")
                if ref is not None
                else pa.nulls(len(t), pa.string()),
            }
        )
        m = pc.and_(pc.is_valid(small["key"]), pc.is_valid(small["val"]))
        small = small.filter(m)
        n = len(small)
        return pa.table(
            {
                "__b": pa.array(_bucket(small["key"])),
                "key": small["key"],
                "val": small["val"],
                "__pid": small["__pid"],
                "__ref": small["__ref"],
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        ch = g.filter(pa.array(side == 1)).select(["key", "val"])
        pt = g.filter(pa.array(side == 0)).select(
            ["key", "val", "__pid", "__ref"]
        )
        if len(pt) == 0:
            return P._empty_result()
        sums = (
            ch.group_by(["key"], use_threads=False)
            .aggregate([("val", "sum")])
            .rename_columns(["key", "child_sum"])
        )
        joined = pt.rename_columns(["key", "parent_val", "__pid", "__ref"]).join(
            sums, keys="key", join_type="left outer"
        )
        pv = joined["parent_val"].to_numpy(zero_copy_only=False)
        csc = joined["child_sum"]
        missing = pc.is_null(csc).to_numpy(zero_copy_only=False)
        cv = pc.fill_null(csc, 0.0).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            bad_diff = ~missing & (np.abs(pv - cv) > tol)
        viol = bad_diff | (missing & missing_viol)
        checked = ~missing | missing_viol  # ignored-missing rows: unchecked
        pids = np.asarray(
            joined["__pid"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        Pmax = int(pids.max()) + 1
        n_checked = np.bincount(pids[checked], minlength=Pmax)
        n_viol = np.bincount(pids[viol], minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([col] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend(n_viol[present].astype(np.int64).tolist())
        idx = np.flatnonzero(viol)[:max_rows]
        if len(idx):
            take = pa.array(idx, type=pa.int64())
            refs = joined["__ref"].take(take).to_pylist()
            for j, i in enumerate(idx):
                out["partition_id"].append(int(pids[i]))
                out["constraint_id"].append(cid)
                out["row_ref"].append(refs[j] if refs[j] is not None else "")
                out["column"].append(col)
                out["observed"].append(
                    f"{pv[i]!r} != sum {'<missing>' if missing[i] else repr(float(cv[i]))}"
                )
                out["detail"].append("reconcile")
                out["is_violation"].append(True)
                out["n_checked"].append(0)
                out["n_violations"].append(0)
        return P.result_rows(out)

    pruned_cols = list(dict.fromkeys([key, col] + _pid_cols(cs) + list(cs.row_ref_cols or [])))
    pruned = ds.map_batches(
        lambda t, c=pruned_cols: t.select([x for x in c if x in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    both = other.map_batches(
        other_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pruned.map_batches(parent_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    return both.groupby("__b").map_groups(per_bucket, batch_format="pyarrow")


def freshness_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """Freshness check (``kind: freshness``): every group's latest
    ``column`` timestamp must be within ``max_age_s`` seconds of
    ``as_of`` — the per-source staleness gate a pipeline runs before
    trusting an ingest. The check unit is the GROUP (``group_by``;
    whole table as one group when omitted): n_checked counts groups,
    a stale group is one violation, attributed to the partition that
    holds the group's LATEST event (the most recent writer).

    Shape: one (partition, group, max-ts) partial row per batch —
    O(partitions × groups × batches), never event rows — merged in a
    single fold task (the completeness convention). NULL timestamps /
    group keys are excluded. ``as_of`` is explicit (ISO string or epoch
    µs), never wall-clock: verdicts must be deterministic and
    re-runnable."""
    col = dist.params["column"]
    as_of = dist.params["as_of"]
    if isinstance(as_of, str):
        as_of_us = int(np.datetime64(as_of, "us").astype(np.int64))
    else:
        as_of_us = int(as_of)
    max_age_s = float(dist.params["max_age_s"])
    threshold = as_of_us - int(round(max_age_s * 1_000_000))
    gb = dist.params.get("group_by") or []
    keys = [gb] if isinstance(gb, str) else list(gb)
    cid = dist.constraint_id
    max_rows = int(
        dist.params.get("max_violation_rows") or P.DEFAULT_MAX_VIOLATIONS_PER_BATCH
    )

    part_schema = pa.schema(
        [("partition_id", pa.int32()), ("g", pa.string()), ("last_us", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        from .hashing import KEY_SEP

        pids = P.build_partition_ids(t, cs)
        cols = {"partition_id": pa.array(np.asarray(pids, dtype=np.int32))}
        if keys:
            parts = [pc.cast(t[k], pa.string()) for k in keys]
            cols["g"] = (
                parts[0]
                if len(parts) == 1
                else pc.binary_join_element_wise(*parts, KEY_SEP)
            )
        else:
            cols["g"] = pa.array([""] * len(t), type=pa.string())
        from .runtime import ts_to_us_int64

        cols["last_us"] = ts_to_us_int64(t[col])
        small = pa.table(cols).drop_null()
        agg = (
            small.group_by(["partition_id", "g"], use_threads=False)
            .aggregate([("last_us", "max")])
            .rename_columns(["partition_id", "g", "last_us"])
        )
        return agg.select(part_schema.names)

    def fold(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return P._empty_result()
        df = t.to_pandas()
        # per group: overall latest ts + the partition holding it
        top = df.sort_values("last_us").groupby("g", sort=True).tail(1)
        last = top["last_us"].to_numpy()
        pids = top["partition_id"].to_numpy().astype(np.int64)
        stale = last < threshold
        Pmax = int(pids.max()) + 1
        n_checked = np.bincount(pids, minlength=Pmax)
        n_viol = np.bincount(pids[stale], minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([col] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend(n_viol[present].astype(np.int64).tolist())
        idx = np.flatnonzero(stale)[:max_rows]
        grefs = top["g"].tolist()
        for i in idx:
            out["partition_id"].append(int(pids[i]))
            out["constraint_id"].append(cid)
            out["row_ref"].append(grefs[i])
            out["column"].append(col)
            out["observed"].append(
                str(np.int64(last[i]).astype("datetime64[us]"))
            )
            out["detail"].append(f"freshness[max_age_s={max_age_s:g}]")
            out["is_violation"].append(True)
            out["n_checked"].append(0)
            out["n_violations"].append(0)
        return P.result_rows(out)

    cols_needed = list(dict.fromkeys([col, *keys] + _pid_cols(cs)))
    partials = ds.map_batches(
        lambda t, c=cols_needed: t.select([x for x in c if x in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


def cardinality_check_results(
    ds: "ray.data.Dataset", cs: ConstraintSet, dist: DistCheck
) -> "ray.data.Dataset":
    """Distinct-cardinality check (``kind: cardinality``): the number
    of distinct ``column`` values — per ``group_by`` group, whole table
    as one group when omitted — must lie within
    [``min_distinct``, ``max_distinct``] (either bound optional) —
    Deequ's ``hasNumberOfDistinctValues`` as a distributed verdict
    ("every language must keep >= k distinct sources", "a categorical
    column stays within its expected arity").

    Shape: per-batch LOCALLY DISTINCT (partition, group, value) rows —
    the B4 uniqueness exchange, one row per distinct triple per batch —
    bucketed on hash(group, value) via the shared combine, crediting
    each globally-distinct (group, value) to its FIRST-writer partition
    (min pid: deterministic under any execution order); per-(group,
    partition) credit counts then merge in a single fold task (the
    completeness convention), which totals each group and attributes
    its verdict to the DOMINANT contributor (max credit, ties → min
    pid). NULL values / group keys are excluded. The check unit is the
    GROUP: n_checked counts groups, an out-of-bounds group is one
    violation with ``row_ref`` = the group and ``observed`` = its
    distinct count."""
    from .runtime import bucketed_group_agg

    col = dist.params["column"]
    lo = dist.params.get("min_distinct")
    hi = dist.params.get("max_distinct")
    gb = dist.params.get("group_by") or []
    keys = [gb] if isinstance(gb, str) else list(gb)
    cid = dist.constraint_id
    max_rows = int(
        dist.params.get("max_violation_rows") or P.DEFAULT_MAX_VIOLATIONS_PER_BATCH
    )
    num_buckets = int(dist.params.get("num_buckets", 256))

    part_schema = pa.schema(
        [("g", pa.string()), ("v", pa.string()), ("partition_id", pa.int32())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        from .hashing import KEY_SEP

        pids = P.build_partition_ids(t, cs)
        cols = {}
        if keys:
            parts = [pc.cast(t[k], pa.string()) for k in keys]
            cols["g"] = (
                parts[0]
                if len(parts) == 1
                else pc.binary_join_element_wise(*parts, KEY_SEP)
            )
        else:
            cols["g"] = pa.array([""] * len(t), type=pa.string())
        cols["v"] = pc.cast(t[col], pa.string())
        cols["partition_id"] = pa.array(np.asarray(pids, dtype=np.int32))
        small = pa.table(cols).drop_null()
        agg = small.group_by(["g", "v"], use_threads=False).aggregate(
            [("partition_id", "min")]
        )
        return agg.rename_columns(["g", "v", "partition_id"]).select(
            part_schema.names
        )

    # each (g, v) lives in exactly one bucket -> the min is global
    pairs = bucketed_group_agg(
        ds.map_batches(
            lambda t, c=list(dict.fromkeys([col, *keys] + _pid_cols(cs))): t.select(
                [x for x in c if x in t.column_names]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "v"],
        [("partition_id", "min")],
        num_buckets=num_buckets,
    )

    def credit_partial(t: pa.Table) -> pa.Table:
        small = t.select(["g", "partition_id"]).append_column(
            "cnt", pa.array(np.ones(len(t), dtype=np.int64))
        )
        agg = small.group_by(["g", "partition_id"], use_threads=False).aggregate(
            [("cnt", "sum")]
        )
        return agg.rename_columns(["g", "partition_id", "cnt"])

    def fold(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return P._empty_result()
        df = (
            t.to_pandas()
            .groupby(["g", "partition_id"], as_index=False)["cnt"]
            .sum()
        )
        totals = df.groupby("g")["cnt"].sum()
        # dominant contributor: max credit, ties -> min pid
        top = (
            df.sort_values(
                ["g", "cnt", "partition_id"], ascending=[True, False, True]
            )
            .groupby("g", sort=True)
            .head(1)
            .set_index("g")
        )
        gs = totals.index.to_numpy()
        tot = totals.to_numpy().astype(np.int64)
        pids = top.loc[gs, "partition_id"].to_numpy().astype(np.int64)
        bad = np.zeros(len(gs), dtype=bool)
        if lo is not None:
            bad |= tot < int(lo)
        if hi is not None:
            bad |= tot > int(hi)
        Pmax = int(pids.max()) + 1
        n_checked = np.bincount(pids, minlength=Pmax)
        n_viol = np.bincount(pids[bad], minlength=Pmax)
        present = np.flatnonzero(n_checked > 0)
        out: dict[str, list] = {k.name: [] for k in P.RESULT_SCHEMA}
        kp = len(present)
        out["partition_id"].extend(present.tolist())
        out["constraint_id"].extend([cid] * kp)
        out["row_ref"].extend([""] * kp)
        out["column"].extend([col] * kp)
        out["observed"].extend([""] * kp)
        out["detail"].extend([""] * kp)
        out["is_violation"].extend([False] * kp)
        out["n_checked"].extend(n_checked[present].astype(np.int64).tolist())
        out["n_violations"].extend(n_viol[present].astype(np.int64).tolist())
        bounds = f"cardinality[{lo if lo is not None else ''},{hi if hi is not None else ''}]"
        for i in np.flatnonzero(bad)[:max_rows]:
            out["partition_id"].append(int(pids[i]))
            out["constraint_id"].append(cid)
            out["row_ref"].append(str(gs[i]))
            out["column"].append(col)
            out["observed"].append(str(int(tot[i])))
            out["detail"].append(bounds)
            out["is_violation"].append(True)
            out["n_checked"].append(0)
            out["n_violations"].append(0)
        return P.result_rows(out)

    credits = pairs.map_batches(credit_partial, batch_format="pyarrow")
    return credits.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )
