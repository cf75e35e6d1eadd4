"""range (interval) join operator tests (ops/joins.py): brute-force
parity across closed conventions, bucket-count invariance, multi-match
pairs, left-join nulls, empty sides."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from vald.ops.joins import range_join

_BASE = np.int64(1_700_000_000_000_000)  # epoch µs


def _corpus(seed=7, n_pts=300, n_iv=120, n_users=12):
    rng = np.random.default_rng(seed)

    pts = pa.table(
        {
            "pid": pa.array(np.arange(n_pts), type=pa.int64()),
            "user_id": pa.array(rng.integers(0, n_users, n_pts), type=pa.int64()),
            "ts": pa.array(
                (_BASE + rng.integers(0, 10**7, n_pts)).astype("datetime64[us]")
            ),
        }
    )
    starts = _BASE + rng.integers(0, 10**7, n_iv)
    durs = rng.integers(1, 500_000, n_iv)
    iv = pa.table(
        {
            "iid": pa.array(np.arange(1000, 1000 + n_iv), type=pa.int64()),
            "user_id": pa.array(rng.integers(0, n_users, n_iv), type=pa.int64()),
            "w_start": pa.array(starts.astype("datetime64[us]")),
            "w_end": pa.array((starts + durs).astype("datetime64[us]")),
        }
    )
    # planted boundary cases on user 0: a point exactly at a start and
    # exactly at an end, and two overlapping intervals containing one point
    b = int(_BASE)
    pts = pa.concat_tables(
        [
            pts,
            pa.table(
                {
                    "pid": pa.array([9001, 9002, 9003], type=pa.int64()),
                    "user_id": pa.array([0, 0, 0], type=pa.int64()),
                    "ts": pa.array(
                        np.array([b + 100, b + 200, b + 150]).astype(
                            "datetime64[us]"
                        )
                    ),
                }
            ),
        ]
    )
    iv = pa.concat_tables(
        [
            iv,
            pa.table(
                {
                    "iid": pa.array([9101, 9102, 9103], type=pa.int64()),
                    "user_id": pa.array([0, 0, 0], type=pa.int64()),
                    "w_start": pa.array(
                        np.array([b + 100, b + 120, b + 140]).astype(
                            "datetime64[us]"
                        )
                    ),
                    "w_end": pa.array(
                        np.array([b + 200, b + 180, b + 160]).astype(
                            "datetime64[us]"
                        )
                    ),
                }
            ),
        ]
    )
    return pts, iv


_OPS = {
    "left": lambda s, t, e: (s <= t) & (t < e),
    "both": lambda s, t, e: (s <= t) & (t <= e),
    "right": lambda s, t, e: (s < t) & (t <= e),
    "neither": lambda s, t, e: (s < t) & (t < e),
}


def _brute(pts: pa.Table, iv: pa.Table, closed="left") -> set:
    """set of matching (pid, iid) pairs."""
    p = pts.to_pandas()
    r = iv.to_pandas()
    pred = _OPS[closed]
    out = set()
    for pid, uid, ts in zip(
        p.pid, p.user_id, p.ts.astype("datetime64[us]").astype(np.int64)
    ):
        cand = r[r.user_id == uid]
        s = cand.w_start.astype("datetime64[us]").astype(np.int64).to_numpy()
        e = cand.w_end.astype("datetime64[us]").astype(np.int64).to_numpy()
        for iid in cand.iid.to_numpy()[pred(s, ts, e)]:
            out.add((int(pid), int(iid)))
    return out


def _run(pts, iv, **kw):
    # repartition an empty side loses its schema in Ray 2.49; keep the
    # single typed block there so the operator can type NULL payloads
    iv_ds = ray.data.from_arrow(iv)
    if len(iv):
        iv_ds = iv_ds.repartition(3)
    out = range_join(
        ray.data.from_arrow(pts).repartition(5),
        iv_ds,
        by="user_id",
        ts_col="ts",
        start_col="w_start",
        end_col="w_end",
        point_cols=["pid", "user_id", "ts"],
        interval_cols={"iid": "iid"},
        **kw,
    ).to_pandas()
    return out


@pytest.mark.parametrize("closed", ["left", "both", "right", "neither"])
def test_range_join_matches_bruteforce(ray_session, closed):
    pts, iv = _corpus()
    expect = _brute(pts, iv, closed)
    got = _run(pts, iv, closed=closed, num_buckets=8)
    pairs = set(zip(got.pid.astype(int), got.iid.astype(int)))
    assert pairs == expect
    assert len(got) == len(pairs)  # no duplicate emissions


def test_range_join_bucket_invariance(ray_session):
    pts, iv = _corpus(seed=23)
    results = []
    for nb in (1, 4, 17):
        got = _run(pts, iv, num_buckets=nb)
        results.append(
            sorted(zip(got.pid.astype(int), got.iid.astype(int)))
        )
    assert results[0] == results[1] == results[2]


def test_range_join_multimatch_and_payload(ray_session):
    pts, iv = _corpus()
    got = _run(pts, iv, closed="left", num_buckets=4)
    # planted: pid 9003 at b+150 inside all three overlapping intervals
    hits = sorted(got[got.pid == 9003].iid.astype(int))
    assert hits == [9101, 9102, 9103]
    # boundary: pid 9001 at a w_start (inclusive), pid 9002 at a w_end
    # (exclusive under "left")
    assert 9101 in set(got[got.pid == 9001].iid.astype(int))
    assert 9101 not in set(got[got.pid == 9002].iid.astype(int))
    # point columns carried through unchanged
    row = got[(got.pid == 9001) & (got.iid == 9101)].iloc[0]
    assert int(row.user_id) == 0


def test_range_join_left_keeps_unmatched(ray_session):
    pts, iv = _corpus(seed=99)
    expect = _brute(pts, iv)
    got = _run(pts, iv, join_type="left", num_buckets=6)
    matched = got[got.iid.notna()]
    assert set(zip(matched.pid.astype(int), matched.iid.astype(int))) == expect
    matched_pids = {p for p, _ in expect}
    unmatched = got[got.iid.isna()]
    assert set(unmatched.pid.astype(int)) == (
        set(pts["pid"].to_pylist()) - matched_pids
    )
    # every point appears: matched rows per pair + one row per unmatched
    assert len(got) == len(expect) + len(unmatched)


def test_range_join_empty_sides(ray_session):
    pts, iv = _corpus(seed=5, n_pts=20, n_iv=10)
    empty_iv = iv.slice(0, 0)
    got = _run(pts, empty_iv, num_buckets=2)
    assert len(got) == 0
    got_left = _run(pts, empty_iv, join_type="left", num_buckets=2)
    assert len(got_left) == len(pts)
    assert got_left.iid.isna().all()


def test_range_join_rejects_bad_args(ray_session):
    pts, iv = _corpus(seed=5, n_pts=5, n_iv=5)
    with pytest.raises(ValueError):
        _run(pts, iv, closed="open")
    with pytest.raises(ValueError):
        _run(pts, iv, join_type="full")
