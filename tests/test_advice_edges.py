"""Regression tests for ADVICE r2 edge cases: the engine/oracle pairs
must agree on inputs the generated testdata doesn't contain — absent /
non-object JSON props (q_one_of), NULL embedding rows (q_unique_items) —
and the LSH group cap must preserve component connectivity."""

import json

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vald import queries as Q


def _write_events(tmp_path, props_values):
    t = pa.table(
        {
            "event_id": pa.array(range(len(props_values)), type=pa.int64()),
            "props": pa.array(props_values, type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _duck_on(sf_dir: str, sql: str, tables=("events", "embeddings")):
    con = duckdb.connect()
    for tbl in tables:
        try:
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{tbl}.parquet')"
            )
        except Exception:
            pass
    return con.execute(sql).fetchdf()


PROPS_EDGES = [
    json.dumps({"k": 60}),        # both branches hold -> violation
    json.dumps({"k": 10}),        # only maximum branch -> ok
    json.dumps({"k": 100}),       # only minimum branch -> ok
    json.dumps({}),               # k absent: both vacuous -> violation
    json.dumps({"j": 1}),         # k absent -> violation
    "null",                       # JSON null doc -> violation
    json.dumps([1, 2]),           # non-object doc -> violation
    json.dumps({"k": "sixty"}),   # non-numeric k: both vacuous -> violation
    json.dumps({"k": True}),      # bool k is NOT a number -> violation
    json.dumps({"k": None}),      # JSON-null k: both vacuous -> violation
    json.dumps({"k": 60.5}),      # numeric double in [50,80] -> violation
    json.dumps({"k": 100.5}),     # numeric double outside -> ok
    json.dumps({"k": {"x": 1}}),  # object k: both vacuous -> violation
    None,                         # SQL NULL props -> skipped on both sides
]


def test_q_one_of_edge_parity(tmp_path, ray_session):
    sf_dir = _write_events(tmp_path, PROPS_EDGES)
    ours = Q.QUERIES["q_one_of"](sf_dir).to_pandas()
    ref = _duck_on(sf_dir, Q.ORACLE_SQL["q_one_of"], tables=("events",))
    assert sorted(ours["event_id"].tolist()) == sorted(ref["event_id"].tolist())
    # spot-check the semantics themselves, not just parity
    expect = {0, 3, 4, 5, 6, 7, 8, 9, 10, 12}
    assert set(ours["event_id"].tolist()) == expect


def test_q_unique_items_null_rows(tmp_path, ray_session):
    emb_type = pa.list_(pa.float32())
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 2.0, 2.0], None, [1.0, 2.0, 3.0], []], type=emb_type
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    ours = (
        Q.QUERIES["q_unique_items"](str(tmp_path))
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    ref = (
        _duck_on(str(tmp_path), Q.ORACLE_SQL["q_unique_items"], tables=("embeddings",))
        .set_index("vec_id")
        .sort_index()
    )
    assert len(ours) == 4
    # NULL row -> NULL n_distinct / is_unique on both sides
    for df in (ours, ref):
        assert df.loc[1].isna().all()
    assert ours.loc[0, "n_distinct"] == ref.loc[0, "n_distinct"] == 2
    assert bool(ours.loc[0, "is_unique"]) == bool(ref.loc[0, "is_unique"]) is False
    assert ours.loc[2, "n_distinct"] == 3 and bool(ours.loc[2, "is_unique"])
    assert ours.loc[3, "n_distinct"] == 0 and bool(ours.loc[3, "is_unique"])


def test_segment_pair_indices_cap_star():
    from vald.ops.dedup import _segment_pair_indices

    starts = np.array([0, 3], dtype=np.int64)
    ends = np.array([3, 9], dtype=np.int64)
    # cap 4: first segment (3) all-pairs, second (6) star against row 3
    ia, ib = _segment_pair_indices(starts, ends, cap=4)
    pairs = set(zip(ia.tolist(), ib.tolist()))
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    star = {(3, j) for j in range(4, 9)}
    assert star <= pairs
    assert len(pairs) == 3 + 5
    # cap large: full C(6,2) pairs on the second segment
    ia, ib = _segment_pair_indices(starts, ends, cap=64)
    assert len(ia) == 3 + 15


def test_minhash_group_cap_preserves_components(ray_session):
    import ray

    from vald.ops.dedup import minhash_dedup_pairs, near_dup_groups

    # 10 identical docs (one hot band group) + 3 distinct docs
    texts = ["the same boilerplate text repeated verbatim " * 4] * 10 + [
        f"totally unrelated document number {i} with its own words {i}"
        for i in range(3)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    full = minhash_dedup_pairs(
        ds, "text", "doc_id", num_perm=32, bands=8, threshold=0.8
    )
    capped = minhash_dedup_pairs(
        ds, "text", "doc_id", num_perm=32, bands=8, threshold=0.8, group_cap=4
    )
    # full: all C(10,2)=45 pairs within the identical cluster; capped:
    # star fallback emits fewer (the filler docs may pair among
    # themselves — restrict both counts to the hot cluster)
    def cluster_pairs(t):
        df = t.to_pandas()
        return df[(df.id_a < 10) & (df.id_b < 10)]

    assert len(cluster_pairs(full)) == 45
    assert 0 < len(cluster_pairs(capped)) < 45
    # but the connected component is identical either way
    def comp(pairs):
        ref = near_dup_groups(pairs)
        members = set(ref.keys()) | set(ref.values())
        return {m for m in members if m < 10}

    assert comp(full) == comp(capped) == set(range(10))
