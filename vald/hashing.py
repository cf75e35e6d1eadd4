"""Stable, vectorized hashing utilities (SURVEY.md B3, §4.3).

Determinism contract: every hash here is stable across processes,
parallelism levels and runs (no PYTHONHASHSEED dependence), because
partition ids and violation keys must be identical at N and 4N
parallelism (SURVEY.md §4.3 "determinism").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["stable_hash64", "partition_ids", "sha256_hex_column"]


def _as_object_array(values) -> np.ndarray:
    if isinstance(values, (pa.ChunkedArray, pa.Array)):
        values = values.to_pylist()
    return np.asarray(values, dtype=object)


def stable_hash64(values) -> np.ndarray:
    """uint64 hash of a string column — pandas' fixed-key siphash
    (``pd.util.hash_array``), deterministic across processes, vectorized.

    CAVEAT (verified in sandbox): pandas hashes strings as C strings —
    the value is TRUNCATED at the first NUL byte, so "a\\x00b" and
    "a\\x00c" collide. Never join composite keys with "\\x00" before
    hashing; use "\\x1f" (KEY_SEP) instead."""
    arr = _as_object_array(values)
    return pd.util.hash_array(arr, categorize=False)


# composite-key join separator, safe for stable_hash64 (see caveat above)
KEY_SEP = "\x1f"


def partition_ids(values, num_partitions: int) -> np.ndarray:
    """partition_id = hash64(key) % P  (SURVEY.md §4.3 partitioning key)."""
    return (stable_hash64(values) % np.uint64(num_partitions)).astype(np.int32)


def sha256_hex_column(values) -> list[str]:
    """Per-row sha256 hex of a string/binary column — the per-row
    invariant vs the reference (BASELINE.json:16 "content sha256
    equality"). ~1 µs/row; runs inside map_batches workers (B3)."""
    out = []
    if isinstance(values, (pa.ChunkedArray, pa.Array)):
        values = values.to_pylist()
    for v in values:
        if v is None:
            out.append(None)
        else:
            b = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
            out.append(hashlib.sha256(b).hexdigest())
    return out
