"""grouped_topk (vald/ops/rank.py): partition invariance, null policy,
tie semantics — the per-batch partial combiner must be invisible in the
result regardless of how rows are split into blocks."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from vald.ops.rank import grouped_topk


def _make(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 17, n), type=pa.int64()),
            "v": pa.array(rng.integers(0, 50, n).astype("float64")),
            "id": pa.array(np.arange(n), type=pa.int64()),
        }
    )


def _expected(t: pa.Table, k: int):
    rows = sorted(
        zip(
            t["k"].to_pylist(), t["v"].to_pylist(), t["id"].to_pylist()
        ),
        key=lambda r: (r[0], -r[1], r[2]),
    )
    out, count, prev = [], 0, None
    for key, v, i in rows:
        if key != prev:
            prev, count = key, 0
        count += 1
        if count <= k:
            out.append((key, v, i, count))
    return sorted(out)


def _run(t: pa.Table, blocks: int, k: int):
    ds = ray.data.from_arrow(t).repartition(blocks)
    res = grouped_topk(ds, key="k", order_col="v", tiebreak="id", k=k).to_pandas()
    return sorted(zip(res["k"], res["v"], res["id"], res["rn"]))


@pytest.mark.parametrize("blocks", [1, 4, 16])
def test_partition_invariance(ray_session, blocks):
    t = _make()
    assert _run(t, blocks, 3) == _expected(t, 3)


def test_k1_argmax_tie_breaks_to_min_id(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], type=pa.int64()),
            "v": pa.array([5.0, 5.0, 1.0, 9.0]),
            "id": pa.array([10, 3, 1, 4], type=pa.int64()),
        }
    )
    got = _run(t, 2, 1)
    assert got == [(1, 5.0, 3, 1), (2, 9.0, 4, 1)]


def test_null_key_and_value_rows_dropped(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, None, 1], type=pa.int64()),
            "v": pa.array([5.0, 9.0, None]),
            "id": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    got = _run(t, 1, 2)
    assert got == [(1, 5.0, 1, 1)]


def test_group_smaller_than_k(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 2, 2], type=pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0]),
            "id": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    got = _run(t, 1, 5)
    assert got == [(1, 1.0, 1, 1), (2, 2.0, 2, 2), (2, 3.0, 3, 1)]


def test_empty_inputs_new_ops(ray_session):
    """0-row inputs flow through grouped_topk, hash_sample, and the
    prefix-filtered jaccard without error."""
    import ray.data
    from vald.ops.dedup import jaccard_pairs_ds
    from vald.ops.sample import hash_sample

    empty_kv = pa.table(
        {
            "k": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.float64()),
            "id": pa.array([], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(empty_kv)
    assert grouped_topk(ds, "k", "v", "id", 3).count() == 0
    assert hash_sample(ds, "id", 0.5).count() == 0

    empty_docs = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
        }
    )
    dd = ray.data.from_arrow(empty_docs)
    assert jaccard_pairs_ds(dd, "text", "doc_id").count() == 0


# ---------------------------------------------------------------------------
# global_rank (exact distributed ROW_NUMBER + NTILE)
# ---------------------------------------------------------------------------


class TestGlobalRank:
    def _table(self, n=3000, seed=11, dup_every=5):
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, n // dup_every, n).astype("float64")  # heavy ties
        vals[::97] = 42.0  # a hot value spanning many rows
        t = pa.table(
            {
                "v": pa.array(vals),
                "id": pa.array(rng.permutation(n).astype("int64")),
            }
        )
        return t

    @staticmethod
    def _expected(t, descending=False):
        import pandas as pd

        df = t.to_pandas().sort_values(
            ["v", "id"], ascending=[not descending, True]
        )
        df["rnk"] = np.arange(1, len(df) + 1, dtype="int64")
        return df.set_index("id")["rnk"]

    @pytest.mark.parametrize("buckets", [1, 7, 64])
    def test_bucket_count_invariance(self, ray_session, buckets):
        from vald.ops.rank import global_rank

        t = self._table()
        out = (
            global_rank(
                ray.data.from_arrow(t).repartition(6), "v", "id",
                num_buckets=buckets,
            )
            .to_pandas()
            .set_index("id")
        )
        exp = self._expected(t)
        assert out["rnk"].sort_index().equals(exp.sort_index())

    def test_descending(self, ray_session):
        from vald.ops.rank import global_rank

        t = self._table(n=800)
        out = (
            global_rank(
                ray.data.from_arrow(t).repartition(4), "v", "id",
                descending=True, num_buckets=8,
            )
            .to_pandas()
            .set_index("id")
        )
        exp = self._expected(t, descending=True)
        assert out["rnk"].sort_index().equals(exp.sort_index())

    def test_ntile_matches_duckdb(self, ray_session):
        import duckdb

        from vald.ops.rank import global_rank

        t = self._table(n=1003)  # total % n != 0 exercises uneven tiles
        out = (
            global_rank(
                ray.data.from_arrow(t).repartition(4), "v", "id",
                ntile=7, num_buckets=8,
            )
            .to_pandas()
            .sort_values("id")
        )
        ref = duckdb.connect().execute(
            "SELECT id, NTILE(7) OVER (ORDER BY v, id) AS tile "
            "FROM t ORDER BY id"
        ).fetchdf()
        assert list(out["tile"]) == list(ref["tile"])

    def test_temporal_order_col_and_null_drop(self, ray_session):
        from vald.ops.rank import global_rank

        ts = pa.array(
            [1_000_000 * x if x is not None else None for x in [5, 3, None, 9, 1]],
            type=pa.timestamp("us"),
        )
        t = pa.table({"ts": ts, "id": pa.array([0, 1, 2, 3, 4], type=pa.int64())})
        out = (
            global_rank(ray.data.from_arrow(t), "ts", "id", num_buckets=2)
            .to_pandas()
            .set_index("id")["rnk"]
            .sort_index()
        )
        assert 2 not in out.index  # NULL ts dropped
        assert list(out.loc[[0, 1, 3, 4]]) == [3, 2, 4, 1]

    def test_string_order_col_rejected(self, ray_session):
        from vald.ops.rank import global_rank

        t = pa.table({"s": ["b", "a"], "id": pa.array([0, 1], type=pa.int64())})
        with pytest.raises(Exception):
            global_rank(ray.data.from_arrow(t), "s", "id").to_pandas()


class TestLatestBy:
    def test_latest_full_rows_and_earliest(self, ray_session):
        from vald.ops.rank import latest_by

        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 2, 3, None], type=pa.int64()),
                "v": pa.array([10, 30, 20, 5, 5, 9, 99], type=pa.int64()),
                "tb": pa.array([0, 1, 2, 3, 4, 5, 6], type=pa.int64()),
                "payload": pa.array(list("abcdefg")),
            }
        )
        out = (
            latest_by(ray.data.from_arrow(t).repartition(3), "k", "v", "tb")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        # max v per key; tie on k=2 (v=5,5) broken by smaller tb → payload d
        assert out["k"].tolist() == [1, 2, 3]
        assert out["payload"].tolist() == ["b", "d", "f"]
        assert list(out.columns) == ["k", "v", "tb", "payload"]
        first = (
            latest_by(
                ray.data.from_arrow(t), "k", "v", "tb", descending=False
            )
            .to_pandas()
            .sort_values("k")
        )
        assert first["payload"].tolist() == ["a", "d", "f"]


class TestGroupPercentRank:
    """ops.rank.group_percent_rank vs pandas rank(method='min') —
    PERCENT_RANK semantics incl. ties, single-row groups, NULL drops,
    bucket invariance."""

    @pytest.mark.parametrize("buckets", [1, 3, 16])
    def test_matches_pandas(self, ray_session, buckets):
        import pandas as pd

        from vald.ops.rank import group_percent_rank

        rng = np.random.default_rng(21)
        n = 500
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c", "lonely"], n,
                                p=[0.45, 0.45, 0.098, 0.002]),
                "v": rng.integers(0, 20, n).astype(float),  # plenty of ties
                "i": np.arange(n),
            }
        )
        df.loc[0, "k"] = None
        df.loc[1, "v"] = None
        t = pa.Table.from_pandas(df, preserve_index=False)
        got = (
            group_percent_rank(
                ray.data.from_arrow(t).repartition(4), "k", "v",
                carry_cols=("i",), num_buckets=buckets,
            )
            .to_pandas()
            .sort_values("i")
            .set_index("i")
        )
        clean = df.dropna(subset=["k", "v"])
        grp = clean.groupby("k")["v"]
        want = (grp.rank(method="min") - 1) / (grp.transform("size") - 1)
        want = want.fillna(0.0)  # single-row group
        assert len(got) == len(clean)
        for i, w in zip(clean["i"], want):
            assert abs(got.loc[i, "pct_rank"] - w) < 1e-12, i
