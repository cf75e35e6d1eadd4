"""Per-partition checkpoint / resume with lineage (SURVEY.md B16).

Ray Data has no job-level checkpointing, so this is explicit design
(BASELINE.json: "resumable from checkpoint with per-partition lineage +
metrics"):

- a *checkpoint partition* is a unit of input (a file shard or a block
  range of the generated corpus) that is validated independently;
- partition outputs are written to deterministic paths
  ``out/violations/partition=<pid>/part-0.parquet`` and
  ``out/verdicts/partition=<pid>/part-0.parquet`` (tables sorted by
  (constraint_id, row_ref) first → byte-deterministic across reruns);
- only after both outputs commit is the manifest
  ``out/_checkpoints/<pid>.json`` written ATOMICALLY (tmp + rename),
  carrying lineage: input files, constraint ids, code version, row and
  byte counts, wall time;
- resume = the planner filters the partition list against completed
  manifests; a crash mid-partition just rewrites that partition
  (outputs are idempotent).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from . import __version__
from .ir import ConstraintSet, compile_table_spec
from .pipeline import validate

__all__ = ["CheckpointManager", "run_resumable"]


class CheckpointManager:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.ckpt_dir = os.path.join(out_dir, "_checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)

    def completed(self) -> set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.ckpt_dir)
            if f.endswith(".json")
        }

    def manifest(self, pid: str) -> dict | None:
        p = os.path.join(self.ckpt_dir, f"{pid}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def commit(self, pid: str, lineage: dict) -> None:
        """Atomic: write tmp then rename (POSIX rename is atomic)."""
        final = os.path.join(self.ckpt_dir, f"{pid}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lineage, f, sort_keys=True)
        os.replace(tmp, final)

    def partition_dir(self, kind: str, pid: str) -> str:
        d = os.path.join(self.out_dir, kind, f"partition={pid}")
        os.makedirs(d, exist_ok=True)
        return d


@dataclass
class RunSummary:
    completed: list[str]
    skipped: list[str]
    total_rows: int
    total_violations: int


def run_resumable(
    partitions: dict[str, Callable[[], "ray.data.Dataset"]],
    spec: dict | ConstraintSet,
    out_dir: str,
    *,
    parents: dict | None = None,
    resume: bool = True,
    concurrency: int | tuple[int, int] = (1, 8),
    pipeline_width: int = 3,
) -> RunSummary:
    """Validate each checkpoint partition independently; skip completed
    ones on resume. ``partitions`` maps pid → thunk producing that
    partition's Dataset (e.g. one input file shard).

    ``pipeline_width`` partitions run CONCURRENTLY (driver threads, each
    driving its own Ray Data pipeline): small shards no longer underfill
    the cluster between partitions, while outputs stay byte-identical —
    each partition's files and manifest are independent, sorted, and
    committed atomically, so completion order cannot affect bytes."""
    import threading

    cs = spec if isinstance(spec, ConstraintSet) else compile_table_spec(spec)
    mgr = CheckpointManager(out_dir)
    done = mgr.completed() if resume else set()
    skipped = [pid for pid in sorted(partitions) if pid in done]
    todo = [pid for pid in sorted(partitions) if pid not in done]

    # Dataset CREATION is serialized: concurrent read_parquet calls race
    # in fsspec's lazy filesystem-registry import (observed: spurious
    # HTTPFileSystem ImportError). Execution stays concurrent — creation
    # is metadata-only and cheap.
    create_lock = threading.Lock()

    def run_one(pid: str) -> tuple[str, int, int]:
        t0 = time.monotonic()
        with create_lock:
            ds = partitions[pid]()
        res = validate(ds, cs, parents=parents, concurrency=concurrency)
        viol = res.violations_table()
        verd = res.verdicts_table()
        pq.write_table(viol, os.path.join(mgr.partition_dir("violations", pid), "part-0.parquet"))
        pq.write_table(verd, os.path.join(mgr.partition_dir("verdicts", pid), "part-0.parquet"))
        rows = int(
            pa.compute.max(verd["n_checked"]).as_py() or 0
        ) if len(verd) else 0
        nviol = int(pa.compute.sum(verd["n_violations"]).as_py() or 0) if len(verd) else 0
        mgr.commit(
            pid,
            {
                "partition_id": pid,
                "input_files": getattr(ds, "input_files", lambda: [])() or [],
                "constraint_ids": cs.constraint_ids,
                "code_version": __version__,
                "rows": rows,
                "n_violations": nviol,
                "wall_s": round(time.monotonic() - t0, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            },
        )
        return pid, rows, nviol

    completed: list[str] = []
    total_rows = total_violations = 0
    if pipeline_width <= 1 or len(todo) <= 1:
        results = [run_one(pid) for pid in todo]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=pipeline_width) as pool:
            results = list(pool.map(run_one, todo))
    for pid, rows, nviol in results:
        completed.append(pid)
        total_rows += rows
        total_violations += nviol
    return RunSummary(completed, skipped, total_rows, total_violations)
