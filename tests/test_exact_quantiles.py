"""aggregates.exact_quantiles (B6 exact mode at scale): histogram-
narrowing distributed selection vs numpy's linear-interpolation
quantile (the quantile_cont definition), including forced multi-pass
narrowing, heavy duplicates, tiny inputs, and null/NaN handling."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from vald.aggregates import exact_quantiles

QS = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]


def _ds(vals, blocks=4):
    t = pa.table({"x": pa.array(vals, type=pa.float64())})
    return ray.data.from_arrow(t).repartition(blocks)


def _check(vals, qs=QS, **kw):
    got = exact_quantiles(_ds(vals), "x", qs, **kw)
    clean = np.asarray([v for v in vals if v is not None and not np.isnan(v)])
    for q in qs:
        want = float(np.quantile(clean, q))
        assert got[q] == pytest.approx(want, abs=1e-9), (q, got[q], want)


def test_matches_numpy_uniform(ray_session):
    rng = np.random.default_rng(7)
    _check(rng.uniform(-1e6, 1e6, size=20_000).tolist())


def test_forced_narrowing_passes(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.lognormal(10, 2, size=20_000).tolist()
    _check(vals, collect_cap=100, buckets=16)


def test_heavy_duplicates(ray_session):
    # one value holds 90% of the mass: narrowing must terminate via
    # the single-distinct-value (lo == hi) exit, not interval shrink
    vals = [42.0] * 18_000 + list(np.linspace(0, 100, 2_000))
    _check(vals, collect_cap=100, buckets=16)


def test_tiny_and_single(ray_session):
    _check([3.0], qs=[0.0, 0.5, 1.0])
    _check([1.0, 2.0], qs=[0.25, 0.5, 0.75])


def test_nulls_and_nans_skipped(ray_session):
    vals = [1.0, None, 2.0, float("nan"), 3.0, None]
    got = exact_quantiles(_ds(vals), "x", [0.5])
    assert got[0.5] == pytest.approx(2.0)


def test_all_null_returns_none(ray_session):
    got = exact_quantiles(_ds([None, None]), "x", [0.5, 0.9])
    assert got == {0.5: None, 0.9: None}


def test_bad_q_rejected(ray_session):
    with pytest.raises(ValueError):
        exact_quantiles(_ds([1.0]), "x", [1.5])
