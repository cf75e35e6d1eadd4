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


def test_full_float64_span(ray_session):
    # ADVICE r4: hi-lo overflows to inf for data straddling ~the whole
    # float64 range; the old affine map sent everything to bucket 0 and
    # the fallback collected the entire column past collect_cap. The
    # bisect guard must narrow normally — same small collect_cap.
    rng = np.random.default_rng(3)
    vals = rng.uniform(-1e6, 1e6, size=5_000).tolist()
    vals += [-1.7e308, -1.6e308, 1.6e308, 1.7e308]
    _check(vals, qs=[0.0, 0.5, 1.0], collect_cap=100, buckets=16)


def test_full_float64_span_grouped(ray_session):
    from vald.aggregates import exact_quantiles_grouped

    vals = [-1.7e308, -1.0, 0.0, 1.0, 1.7e308] * 40
    t = pa.table(
        {"g": ["a"] * 100 + ["b"] * 100, "x": pa.array(vals, type=pa.float64())}
    )
    got = exact_quantiles_grouped(
        ray.data.from_arrow(t).repartition(3), "x", "g", [0.5], collect_cap=10
    )
    for g in ("a", "b"):
        assert got[g][0.5] == pytest.approx(0.0)


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


class TestGrouped:
    def _gds(self, keys, vals, blocks=4):
        t = pa.table({"g": keys, "x": pa.array(vals, type=pa.float64())})
        return ray.data.from_arrow(t).repartition(blocks)

    def test_matches_numpy_per_group(self, ray_session):
        from vald.aggregates import exact_quantiles_grouped

        rng = np.random.default_rng(3)
        keys = rng.choice(["a", "b", "c"], size=5000).tolist()
        vals = rng.normal(0, 100, size=5000).tolist()
        got = exact_quantiles_grouped(
            self._gds(keys, vals), "x", "g", [0.1, 0.5, 0.9]
        )
        for g in ("a", "b", "c"):
            xs = np.asarray([v for k, v in zip(keys, vals) if k == g])
            for q in (0.1, 0.5, 0.9):
                assert got[g][q] == pytest.approx(float(np.quantile(xs, q)), abs=1e-9)

    def test_forced_narrowing_and_int_keys(self, ray_session):
        from vald.aggregates import exact_quantiles_grouped

        rng = np.random.default_rng(5)
        keys = rng.integers(0, 4, size=4000).tolist()
        vals = rng.lognormal(5, 1, size=4000).tolist()
        got = exact_quantiles_grouped(
            self._gds(keys, vals), "x", "g", [0.5], collect_cap=50, buckets=8
        )
        for g in range(4):
            xs = np.asarray([v for k, v in zip(keys, vals) if k == g])
            assert got[g][0.5] == pytest.approx(float(np.quantile(xs, 0.5)), abs=1e-9)

    def test_null_group_key_forms_own_group(self, ray_session):
        from vald.aggregates import exact_quantiles_grouped

        keys = ["a", None, "a", None, None]
        vals = [1.0, 10.0, 3.0, 20.0, 30.0]
        got = exact_quantiles_grouped(self._gds(keys, vals), "x", "g", [0.5])
        assert got["a"][0.5] == pytest.approx(2.0)
        nulls = [k for k in got if not isinstance(k, str)]
        assert len(nulls) == 1
        assert got[nulls[0]][0.5] == pytest.approx(20.0)

    def test_max_groups_guard(self, ray_session):
        from vald.aggregates import exact_quantiles_grouped

        keys = [str(i) for i in range(30)]
        vals = [float(i) for i in range(30)]
        with pytest.raises(ValueError):
            exact_quantiles_grouped(
                self._gds(keys, vals), "x", "g", [0.5], max_groups=10
            )


def test_infinities_sort_outside_finite_band(ray_session):
    vals = [float("-inf")] * 3 + list(np.linspace(0, 10, 11)) + [float("inf")] * 2
    got = exact_quantiles(_ds(vals), "x", [0.0, 0.5, 1.0])
    clean = np.asarray(vals)
    assert got[0.0] == float("-inf")
    assert got[0.5] == pytest.approx(float(np.quantile(clean, 0.5)))
    assert got[1.0] == float("inf")


def test_grouped_all_null_group_and_inf(ray_session):
    from vald.aggregates import exact_quantiles_grouped

    t = pa.table(
        {
            "g": ["a", "a", "a", "b", "b"],
            "x": pa.array([1.0, 2.0, float("inf"), None, None], type=pa.float64()),
        }
    )
    got = exact_quantiles_grouped(ray.data.from_arrow(t).repartition(2), "x", "g", [0.5, 1.0])
    assert got["a"][0.5] == pytest.approx(2.0)
    assert got["a"][1.0] == float("inf")
    assert got["b"] == {0.5: None, 1.0: None}
