"""Oracle parity (SURVEY.md §5.2.4): run every catalog query through
Ray Data AND its DuckDB oracle on the same parquet, compare row count +
column names + order-insensitive values — the same gate the driver
applies at sf0.01."""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"  # small sf for test speed; driver uses 0.01
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(None if math.isnan(v) else round(v, 6))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def _to_df(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # Dataset


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, ray_session):
    ours = _to_df(QUERIES[name](SF_DIR))
    ref = _duck(ORACLES[name])
    assert len(ours) == len(ref), f"{name}: rows {len(ours)} != {len(ref)}"
    assert sorted(map(str.lower, ours.columns)) == sorted(
        map(str.lower, ref.columns)
    ), f"{name}: columns {list(ours.columns)} != {list(ref.columns)}"
    ref.columns = [c.lower() for c in ref.columns]
    ours.columns = [c.lower() for c in ours.columns]
    assert _canon(ours) == _canon(ref), f"{name}: values differ"


def test_rows_only_queries(ray_session):
    for name in set(QUERIES) - set(ORACLES):
        out = _to_df(QUERIES[name](SF_DIR))
        assert len(out) >= 0  # runs and returns a frame


def test_entry_smoke(ray_session):
    df = entrymod.entry()
    assert len(df) > 0
    assert {"table", "constraint_id", "pass", "n_checked", "n_violations"} <= set(df.columns)
    # clean testdata tables must pass everything; corpus, the
    # orders_rec reconcile fire-check and the documents_card
    # cardinality fire-check must have failures by design
    clean = df[~df.table.isin(["corpus", "orders_rec", "documents_card"])]
    assert clean["pass"].all(), clean[~clean["pass"]].head()
    assert (~df[df.table == "corpus"]["pass"]).any()
    assert (~df[df.table == "orders_rec"]["pass"]).any()
    card = df[df.table == "documents_card"]
    assert (~card["pass"]).any()  # zh: 19 < 20 distinct sources
    assert int(card["n_violations"].sum()) == 1
