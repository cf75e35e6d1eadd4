"""Small runtime-environment helpers shared across stages."""

from __future__ import annotations

import ray

__all__ = ["join_partitions"]


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
