"""Sketch accuracy vs exact twins (SURVEY.md §5.2.5): HLL rel err < 2%
at p=14; t-digest rank error < 0.01; merge associativity; serde."""

import numpy as np
import pytest

from vald.sketches import HLL, Histogram, TDigest, ks_statistic


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    for true_n in (100, 10_000, 200_000):
        vals = rng.integers(0, 1 << 60, size=true_n * 2) % (10**12)
        vals = np.unique(vals)[:true_n]
        h = HLL().update(vals)
        est = h.estimate()
        assert abs(est - len(vals)) / len(vals) < 0.02, (true_n, est)
        # split-merge equals whole
        h1, h2 = HLL().update(vals[: true_n // 2]), HLL().update(vals[true_n // 2 :])
        merged = h1.merge(h2)
        assert merged.estimate() == pytest.approx(est)


def test_hll_strings_and_serde():
    vals = [f"key-{i}" for i in range(5000)]
    h = HLL().update(vals)
    assert abs(h.estimate() - 5000) / 5000 < 0.03
    h2 = HLL.deserialize(h.serialize())
    assert h2.estimate() == h.estimate()


def test_tdigest_quantiles():
    rng = np.random.default_rng(11)
    data = rng.lognormal(3, 1, 100_000)
    td = TDigest()
    for chunk in np.array_split(data, 13):
        td.update(chunk)
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = td.quantile(q)
        # rank error: where does est land in the true CDF?
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.01, (q, rank)


def test_tdigest_merge_and_cdf():
    rng = np.random.default_rng(3)
    a_data, b_data = rng.normal(0, 1, 50_000), rng.normal(0, 1, 50_000)
    a, b = TDigest().update(a_data), TDigest().update(b_data)
    a.merge(b)
    allv = np.concatenate([a_data, b_data])
    assert a.total_weight == pytest.approx(100_000)
    for x in (-2, -1, 0, 1, 2):
        true_cdf = (allv <= x).mean()
        assert a.cdf(x) == pytest.approx(true_cdf, abs=0.01)
    # serde
    a2 = TDigest.deserialize(a.serialize())
    assert a2.quantile(0.5) == pytest.approx(a.quantile(0.5))


def test_tdigest_edge_cases():
    assert np.isnan(TDigest().quantile(0.5))
    td = TDigest().update([5.0])
    assert td.quantile(0.1) == 5.0 and td.quantile(0.9) == 5.0
    td2 = TDigest().update([1.0] * 1000)  # repeated values
    assert td2.quantile(0.5) == pytest.approx(1.0)
    td3 = TDigest().update([float("nan"), 1.0, 2.0])
    assert td3.total_weight == 2.0  # NaN dropped


def test_histogram_psi():
    rng = np.random.default_rng(5)
    base = Histogram(0, 100, 32).update(rng.uniform(0, 100, 50_000))
    same = Histogram(0, 100, 32).update(rng.uniform(0, 100, 50_000))
    shifted = Histogram(0, 100, 32).update(rng.uniform(20, 120, 50_000))
    assert base.psi(same) < 0.01
    assert base.psi(shifted) > 0.25  # PSI > 0.25 = major shift (industry rule)
    h2 = Histogram.deserialize(base.serialize())
    assert (h2.counts == base.counts).all()


def test_ks_statistic():
    rng = np.random.default_rng(9)
    a = TDigest().update(rng.normal(0, 1, 50_000))
    b = TDigest().update(rng.normal(0, 1, 50_000))
    c = TDigest().update(rng.normal(1, 1, 50_000))  # shifted +1σ
    assert ks_statistic(a, b) < 0.02
    # true KS between N(0,1) and N(1,1) is ~0.38
    assert ks_statistic(a, c) == pytest.approx(0.38, abs=0.05)
