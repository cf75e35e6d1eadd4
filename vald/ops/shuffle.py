"""Deterministic global shuffle (training-data output op).

Before sharding a curated corpus into training files, examples must be
globally shuffled so each shard is an unbiased sample. Ray's
``random_shuffle()`` is an all-to-all with non-reproducible placement;
training pipelines want DETERMINISM: the same corpus must shuffle to
the same order on every run (resumable output, debuggable ordering) at
ANY parallelism, and a new epoch must be a cheap re-salt, not new RNG
state.

``hash_shuffle`` delivers that as hash-order sorting: stamp a Knuth
multiplicative hash of a key column (mixed with ``salt`` for per-epoch
re-shuffles) and run Ray's distributed range-partition sort on the
stamped hash. The hash is uniform, so the "sort" is a balanced
shuffle; the order is a pure function of (key, salt); and the same
formula is expressible in ANSI SQL, so the order itself is
oracle-checkable (queries.q_shuffle ranks it with ops.rank.global_rank
against ROW_NUMBER() over the same expression).

Scale: one all-to-all exchange (the sort) — the theoretical minimum
for a global shuffle; the hash column is 8 bytes/row on top of the
payload. For 100 TB prefer shuffling the (key, shard-assignment)
projection and gathering payloads per output shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def shuffle_hash(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """The shuffle order key: ``((key + salt) * 2654435761) mod 2^32``
    — canonical non-negative, SQL-reproducible (see queries.q_shuffle
    oracle). int64-able key columns only; the salt permutes the order
    for a new epoch."""
    k = keys.astype(np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = ((k + np.uint64(salt)) * _KNUTH) % _M32
    return h.astype(np.int64)


def hash_shuffle(
    ds: "ray.data.Dataset",
    key: str,
    *,
    salt: int = 0,
    keep_hash: bool = False,
) -> "ray.data.Dataset":
    """Deterministically shuffle ``ds`` into hash-of-``key`` order.

    NULL keys are dropped (an example without a stable identity cannot
    be placed deterministically; hash ties between equal keys are
    broken by the key itself via the composite sort). Returns the
    dataset sorted by ``(hash, key)``; with ``keep_hash`` the stamped
    ``__shuffle_h`` column stays for inspection/sharding."""

    def stamp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key]))
        k = pc.fill_null(t[key], 0).to_numpy(zero_copy_only=False)
        return t.append_column("__shuffle_h", pa.array(shuffle_hash(k, salt)))

    out = ds.map_batches(
        stamp, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["__shuffle_h", key])
    if keep_hash:
        return out
    return out.map_batches(
        lambda t: t.drop_columns(["__shuffle_h"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
