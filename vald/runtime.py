"""Small runtime-environment helpers shared across stages."""

from __future__ import annotations

import ray

__all__ = ["join_partitions", "join_remote_args", "join_barrier"]


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
