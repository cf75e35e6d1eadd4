"""Small runtime-environment helpers shared across stages."""

from __future__ import annotations

import ray

__all__ = [
    "join_partitions",
    "join_remote_args",
    "join_barrier",
    "bucketed_group_agg",
]


def join_barrier(ds):
    """Materialize barrier between an upstream all-to-all (groupby /
    sort) and a downstream ``Dataset.join``.

    Ray 2.49's streaming executor LIVELOCKS when an AllToAllOperator
    feeds a JoinOperator on a small CPU budget (measured in-sandbox at
    num_cpus=2: groupby→join ran >400 s without progress — machine
    ~96% idle — while the same join against the MATERIALIZED groupby
    output finished in 4 s; fractional aggregator CPUs did not help,
    so it is the operator-pipelining interaction, not CPU
    reservation). The barrier costs one object-store pass over the
    join input — typically the PRE-AGGREGATED side (one row per
    distinct key), far smaller than the raw input — and Ray spills it
    if needed, so this stays safe at cluster scale, where the extra
    pass is also the only cost (the livelock itself mainly bites
    small/busy clusters)."""
    return ds.materialize()


def barrier_nonempty(ds) -> "tuple | None":
    """``join_barrier`` + empty-input guard for ``Dataset.join``.

    Ray 2.49 propagates 0-row blocks as SCHEMA-LESS RefBundles; when
    every block of a join input is empty the join aggregator hands
    acero an empty table with NO columns and the join dies with
    ``No match ... for key field reference`` instead of returning the
    correct empty result (measured in-sandbox: a dimension filter that
    matches no rows at sf0.001). Returns ``(materialized_ds, count)``
    so callers can short-circuit to their empty result when count==0 —
    the barrier is the same one ``join_barrier`` already requires, so
    this costs nothing extra on pre-aggregated join inputs."""
    m = ds.materialize()
    return m, m.count()


def join_remote_args() -> dict:
    """``aggregator_ray_remote_args`` for ``Dataset.join``.

    Ray 2.49's hash-shuffle join reserves ONE WHOLE CPU per aggregator
    actor for the lifetime of the pipeline. When the join's upstream
    contains its own all-to-all (e.g. a groupby feeding the join),
    aggregators for the join grab the CPUs at launch and the upstream
    barrier can never schedule → LIVELOCK on small clusters (measured
    in-sandbox: q_shipping_priority at num_cpus=2 ran >10 min without
    completing vs ~7 s at 32; a join with pre-materialized inputs at
    the same width finishes in seconds, isolating the reservation —
    not the join itself — as the cause). Fractional reservation keeps
    every aggregator schedulable while leaving most of each CPU for
    the producing tasks; aggregators are IO/accumulate-bound between
    barrier flushes, so under-reserving costs little at any scale."""
    return {"num_cpus": 0.25}


def join_partitions(requested: int | None, default: int = 8) -> int:
    """Clamp a hash-join partition count to the cluster's CPU budget.

    Ray 2.49's hash-shuffle ``Dataset.join`` spins up ~``num_partitions``
    concurrent aggregators; asking for far more partitions than CPUs
    DEADLOCKS on a small cluster (verified in-sandbox: num_partitions=32
    on a 4-CPU local cluster hangs forever, 4 completes). On a real
    multi-node cluster the CPU budget is the whole cluster's, so this
    still scales out; callers wanting more partitions than CPUs must opt
    in explicitly at the call site.
    """
    want = requested or default
    try:
        cpus = int(ray.cluster_resources().get("CPU", default))
    except Exception:  # not initialised yet — let the call site's value stand
        return want
    return max(2, min(want, cpus))


def bucketed_group_agg(
    ds,
    keys: "str | list[str]",
    aggs: "list[tuple[str, str]]",
    num_buckets: int = 256,
):
    """EXACT grouped aggregation over a high-cardinality key, shaped as
    hash-bucket shuffle + vectorized ``pa.Table.group_by`` combine.

    Ray 2.49's ``groupby(key).aggregate(...)`` range-partitions on the
    RAW key (sample + sort) and merges per named aggregate in Python —
    measured ~10x slower than this shape at high key cardinality
    (2.4M distinct string keys, 8 cpus: 77 s vs 8 s; see
    ``jaccard_pairs_ds`` stage 1). Here the exchange is the same bytes
    but keyed by a small int32 hash bucket, and each bucket's combine
    is one Arrow hash-aggregate kernel.

    The caller supplies COMBINABLE partials: every (col, fn) in
    ``aggs`` is re-applied per bucket, so feed pre-aggregated batches
    whose fn is its own combiner (sum of sums, min of mins, max of
    maxes; count partials must arrive as a column combined with
    "sum"). Output columns keep their input names. Grouping is exact —
    a key lives in exactly one bucket; hash quality only balances
    buckets, never correctness. NULL keys hash like values (pandas
    siphash) and group together as in Arrow group_by.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    key_list = [keys] if isinstance(keys, str) else list(keys)
    out_names = key_list + [c for c, _ in aggs]
    mix = np.uint64(0x9E3779B97F4A7C15)

    def stamp(t: "pa.Table") -> "pa.Table":
        h = np.zeros(len(t), dtype=np.uint64)
        for kc in key_list:
            arr = t[kc].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                h = h * mix + pd.util.hash_array(arr, categorize=False)
        return t.append_column(
            "__gb", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def combine(g: "pa.Table") -> "pa.Table":
        r = g.group_by(key_list, use_threads=False).aggregate(aggs)
        return r.rename_columns(out_names)

    return (
        ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(combine, batch_format="pyarrow")
    )
