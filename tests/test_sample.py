"""hash_sample (vald/ops/sample.py): determinism, null keys, frac bounds."""

import pyarrow as pa

import ray.data

from vald.ops.sample import hash_sample


def test_deterministic_and_null_safe(ray_session):
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, None, 5, 6, 7, 8, 9, 10] * 50, type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    a = sorted(hash_sample(ds, "id", 0.5).to_pandas()["id"])
    b = sorted(hash_sample(ds, "id", 0.5).to_pandas()["id"])
    assert a == b  # deterministic, repartition-stable
    assert all(x == x for x in a)  # no NaN/None survived


def test_frac_extremes(ray_session):
    t = pa.table({"id": pa.array(list(range(100)), type=pa.int64())})
    ds = ray.data.from_arrow(t)
    assert len(hash_sample(ds, "id", 0.0).to_pandas()) == 0
    assert len(hash_sample(ds, "id", 1.0).to_pandas()) == 100
