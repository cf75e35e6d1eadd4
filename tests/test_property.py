"""Property-based tests (hypothesis): the distributed implementations
must agree with their sequential definitions on ARBITRARY inputs, not
just the fixtures — exact_quantiles vs numpy's quantile_cont, and
watermark_late vs a literal replay of the watermark definition.

Example counts are kept small: each example drives real Ray Dataset
pipelines (~100 ms apiece)."""

from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray

from vald.aggregates import exact_quantiles
from vald.ops.windows import watermark_late

_SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.lists(
    st.one_of(
        st.floats(
            min_value=-1e12,
            max_value=1e12,
            allow_nan=False,
            allow_infinity=False,
        ),
        st.none(),
        st.just(float("inf")),
        st.just(float("-inf")),
    ),
    min_size=1,
    max_size=300,
)


@given(vals=_vals, q=st.floats(min_value=0.0, max_value=1.0))
@_SET
def test_exact_quantile_matches_duckdb(ray_session, vals, q):
    """Reference = DuckDB quantile_cont (NOT numpy: numpy's lerp
    NaN-poisons on an infinite bracket endpoint — inf - inf — where
    both DuckDB and exact_quantiles return the infinite endpoint)."""
    import duckdb

    clean = [v for v in vals if v is not None]
    if not clean:
        return
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, type=pa.float64())})
    ).repartition(3)
    got = exact_quantiles(ds, "x", [q], collect_cap=8, buckets=4)[q]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in clean])
    want = con.execute(f"SELECT quantile_cont(x, {q!r}) FROM t").fetchone()[0]
    if np.isfinite(want):
        assert got == pytest.approx(want, rel=1e-12, abs=1e-9)
    elif np.isnan(want):  # a -inf..+inf bracket is indeterminate
        assert np.isnan(got)
    else:
        assert got == want  # ±inf endpoints compare exactly


_T0 = datetime(2024, 1, 1)


@given(
    offs=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200
    ),
    delay=st.integers(min_value=0, max_value=5_000),
)
@_SET
def test_watermark_matches_replay(ray_session, offs, delay):
    rows = list(enumerate(offs))  # arrival seq i carries event minute offs[i]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "seq": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array(
                    [_T0 + timedelta(minutes=r[1]) for r in rows],
                    type=pa.timestamp("us"),
                ),
            }
        )
    ).repartition(3)
    got = (
        watermark_late(
            ds, "ts", ("seq",), delay=timedelta(minutes=delay), num_buckets=5
        )
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    prior = None
    for i, off in rows:
        row = got.loc[i]
        if prior is None:
            assert not row["is_late"]
        else:
            wm = prior - delay
            assert row["watermark"] == _T0 + timedelta(minutes=wm)
            assert bool(row["is_late"]) == (off < wm)
        prior = off if prior is None else max(prior, off)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=120),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    strict=st.booleans(),
)
@_SET
def test_monotonic_matches_pandas_replay(ray_session, keys, seed, strict):
    from vald.ops.stats import monotonic_violations_ds

    rng = np.random.default_rng(seed)
    n = len(keys)
    order = rng.permutation(n)
    vals = rng.integers(-5, 5, n).astype(float)
    t = pa.table(
        {
            "k": pa.array(keys, type=pa.int64()),
            "o": pa.array(order, type=pa.int64()),
            "v": pa.array(vals),
        }
    )
    got = (
        monotonic_violations_ds(
            ray.data.from_arrow(t).repartition(3), "k", "o", "v",
            strict=strict, num_buckets=4,
        )
        .to_pandas()
        .astype("int64")
        .sort_values("k")
        .reset_index(drop=True)
    )
    import pandas as pd

    df = t.to_pandas().sort_values(["k", "o"])
    prev = df.groupby("k")["v"].shift(1)
    viol = ((df["v"] <= prev) if strict else (df["v"] < prev)).fillna(False)
    exp = (
        df.assign(viol=viol)
        .groupby("k")
        .agg(n_rows=("v", "size"), n_violations=("viol", "sum"))
        .reset_index()
        .astype("int64")
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "n_rows", "n_violations"]], exp)
