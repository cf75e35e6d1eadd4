"""Cardinality check (kind: cardinality / ops.stats.distinct_bounds_ds):
exact distinct counts vs pandas, bounds verdicts both ways, grouped +
whole-table modes, validate() integration with first-writer/dominant
partition attribution, parallelism invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray

from vald import pipeline as P
from vald.ir import compile_table_spec
from vald.ops.stats import distinct_bounds_ds


def _tbl() -> pa.Table:
    # lang a: values {x, y, z} (3 distinct); lang b: {x} (1); lang c:
    # {x, y} (2); one NULL value and one NULL lang excluded
    rows = [
        ("a", "x", 0), ("a", "y", 0), ("a", "z", 1), ("a", "x", 1),
        ("b", "x", 0), ("b", "x", 1),
        ("c", "x", 1), ("c", "y", 1),
        ("a", None, 0), (None, "q", 1),
    ]
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows]),
            "src": pa.array([r[1] for r in rows]),
            "part": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


class TestDistinctBoundsOp:
    @pytest.mark.parametrize("blocks", [1, 3])
    def test_grouped(self, ray_session, blocks):
        import ray.data

        out = (
            distinct_bounds_ds(
                ray.data.from_arrow(_tbl()).repartition(blocks),
                "src", "lang", min_distinct=2,
            )
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        assert out["lang"].tolist() == ["a", "b", "c"]
        assert out["n_distinct"].tolist() == [3, 1, 2]
        assert out["ok"].tolist() == [True, False, True]

    def test_whole_table_and_upper_bound(self, ray_session):
        import ray.data

        out = distinct_bounds_ds(
            ray.data.from_arrow(_tbl()), "src", None, max_distinct=3
        ).to_pandas()
        assert len(out) == 1
        assert out.loc[0, "n_distinct"] == 4  # x, y, z, q
        assert not bool(out.loc[0, "ok"])


class TestCardinalitySpec:
    def _spec(self, **kw):
        return compile_table_spec(
            {
                "table": "docs",
                "partition_by": "part",
                "num_partitions": 2,
                "columns": {},
                "checks": [
                    {"kind": "cardinality", "column": "src",
                     "group_by": "lang", **kw}
                ],
            }
        )

    def test_validate_integration(self, ray_session):
        import ray.data

        res = P.validate(
            ray.data.from_arrow(_tbl()).repartition(3),
            self._spec(min_distinct=2),
            concurrency=2,
        )
        v = res.verdicts_table()
        rows = v.filter(pc.equal(v["constraint_id"], "docs.src.cardinality"))
        assert int(pc.sum(rows["n_checked"]).as_py()) == 3  # unit = groups
        assert int(pc.sum(rows["n_violations"]).as_py()) == 1
        viol = res.violations_table()
        viol = viol.filter(
            pc.equal(viol["constraint_id"], "docs.src.cardinality")
        )
        assert len(viol) == 1
        assert viol["row_ref"].to_pylist() == ["b"]
        assert viol["observed"].to_pylist() == ["1"]

    def test_all_within_bounds_passes(self, ray_session):
        import ray.data

        res = P.validate(
            ray.data.from_arrow(_tbl()), self._spec(min_distinct=1, max_distinct=5),
            concurrency=2,
        )
        v = res.verdicts_table()
        rows = v.filter(pc.equal(v["constraint_id"], "docs.src.cardinality"))
        assert int(pc.sum(rows["n_violations"]).as_py()) == 0

    def test_missing_bounds_rejected(self, ray_session):
        with pytest.raises(ValueError, match="min_distinct"):
            self._spec()
