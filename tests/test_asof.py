"""as-of join operator tests (ops/joins.py): brute-force parity,
bucket-count invariance, left-join nulls, tolerance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from vald.ops.joins import asof_join


def _events(seed=11, n_left=400, n_right=600, n_users=25):
    rng = np.random.default_rng(seed)
    base = np.int64(1_700_000_000_000_000)  # epoch µs

    def mk(n, id0):
        return pa.table(
            {
                "event_id": pa.array(np.arange(id0, id0 + n), type=pa.int64()),
                "user_id": pa.array(
                    rng.integers(0, n_users, size=n), type=pa.int64()
                ),
                "ts": pa.array(
                    (base + rng.integers(0, 10**9, size=n)).astype(
                        "datetime64[us]"
                    )
                ),
                "val": pa.array(rng.normal(size=n), type=pa.float64()),
            }
        )

    left = mk(n_left, 0)
    right = mk(n_right, 10_000)
    # planted edge cases: a right-ts tie pair, and an exact left==right ts
    tie_ts = base + 123_456
    extra_r = pa.table(
        {
            "event_id": pa.array([20_001, 20_002], type=pa.int64()),
            "user_id": pa.array([0, 0], type=pa.int64()),
            "ts": pa.array(np.array([tie_ts, tie_ts]).astype("datetime64[us]")),
            "val": pa.array([1.0, 2.0], type=pa.float64()),
        }
    )
    extra_l = pa.table(
        {
            "event_id": pa.array([20_003], type=pa.int64()),
            "user_id": pa.array([0], type=pa.int64()),
            "ts": pa.array(np.array([tie_ts]).astype("datetime64[us]")),
            "val": pa.array([0.0], type=pa.float64()),
        }
    )
    return (
        pa.concat_tables([left, extra_l]),
        pa.concat_tables([right, extra_r]),
    )


def _brute(left: pa.Table, right: pa.Table, tol_us=None) -> dict:
    """event_id -> matched right ts (µs int) or None."""
    r = right.to_pandas()
    out = {}
    for eid, uid, ts in zip(
        left["event_id"].to_pylist(),
        left["user_id"].to_pylist(),
        left["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64),
    ):
        cand = r[r.user_id == uid]
        cts = cand["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cts = cts[cts <= ts]
        if tol_us is not None:
            cts = cts[ts - cts <= tol_us]
        out[eid] = int(cts.max()) if len(cts) else None
    return out


def _got(out_df: pd.DataFrame) -> dict:
    return {
        int(e): int(np.datetime64(v, "us").astype(np.int64))
        for e, v in zip(out_df.event_id, out_df.view_ts)
        if not pd.isnull(v)
    }


def test_asof_inner_matches_bruteforce(ray_session):
    lt, rt = _events()
    expect = {k: v for k, v in _brute(lt, rt).items() if v is not None}
    out = asof_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        by="user_id",
        ts_col="ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols={"ts": "view_ts"},
        join_type="inner",
        num_buckets=8,
    ).to_pandas()
    assert _got(out) == expect
    assert len(out) == len(expect)


def test_asof_bucket_invariance(ray_session):
    lt, rt = _events(seed=5)
    outs = []
    for nb in (2, 37):
        out = asof_join(
            ray.data.from_arrow(lt),
            ray.data.from_arrow(rt),
            by="user_id",
            ts_col="ts",
            left_cols=["event_id", "user_id", "ts"],
            right_cols={"ts": "view_ts"},
            num_buckets=nb,
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_asof_left_join_and_tolerance(ray_session):
    lt, rt = _events(seed=9)
    tol = 50_000_000  # 50 s in µs
    expect = _brute(lt, rt, tol_us=tol)
    out = asof_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(rt),
        by="user_id",
        ts_col="ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols={"ts": "view_ts"},
        join_type="left",
        tolerance=tol,
        num_buckets=8,
    ).to_pandas()
    # every left row present exactly once
    assert sorted(out.event_id) == sorted(lt["event_id"].to_pylist())
    got = _got(out)
    assert got == {k: v for k, v in expect.items() if v is not None}
    # unmatched rows carry NULL
    n_null = int(out.view_ts.isnull().sum())
    assert n_null == sum(1 for v in expect.values() if v is None)


def test_asof_exact_ts_and_payload(ray_session):
    """left.ts == right.ts matches (>= semantics); a non-ts payload
    column gathers from the matched row."""
    lt = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "user_id": pa.array([7, 7], type=pa.int64()),
            "ts": pa.array(np.array([1000, 50], dtype="datetime64[us]")),
        }
    )
    rt = pa.table(
        {
            "user_id": pa.array([7, 7], type=pa.int64()),
            "ts": pa.array(np.array([1000, 10], dtype="datetime64[us]")),
            "score": pa.array([3.5, 9.9], type=pa.float64()),
        }
    )
    out = (
        asof_join(
            ray.data.from_arrow(lt),
            ray.data.from_arrow(rt),
            by="user_id",
            ts_col="ts",
            left_cols=["event_id", "user_id", "ts"],
            right_cols={"ts": "view_ts", "score": "view_score"},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out.event_id) == [1, 2]
    assert out.view_score[0] == 3.5  # exact-ts match
    assert out.view_score[1] == 9.9  # nearest prior
