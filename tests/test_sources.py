"""B1 breadth: JSONL / CSV sources feeding the same validate() pipeline,
and raw per-line JSON documents through the dynamic jsonSchema path."""

import json

import pyarrow as pa

import ray.data

from vald.pipeline import validate
from vald.sources import jsonl_documents, read_source

SPEC = {
    "table": "t",
    "row_ref": ["id"],
    "columns": {
        "id": {"required": True},
        "name": {"required": True, "minLength": 2},
        "score": {"minimum": 0, "maximum": 100},
    },
}

ROWS = [
    {"id": 1, "name": "alpha", "score": 50},
    {"id": 2, "name": "x", "score": 50},  # name too short
    {"id": 3, "name": "gamma", "score": 150},  # score too high
    {"id": 4, "name": "delta", "score": 0},
]


def _expect(res):
    verd = res.verdicts_table().to_pandas().set_index("constraint_id")
    assert int(verd.loc["t.name.minLength", "n_violations"]) == 1
    assert int(verd.loc["t.score.maximum", "n_violations"]) == 1
    assert int(verd.loc["t.id.required", "n_violations"]) == 0
    viols = res.violations_table().to_pandas()
    assert set(viols["row_ref"]) == {"2", "3"}


def test_jsonl_source(ray_session, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS) + "\n")
    ds = read_source(str(p), format="jsonl")
    _expect(validate(ds, SPEC))


def test_csv_source(ray_session, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text(
        "id,name,score\n" + "\n".join(f"{r['id']},{r['name']},{r['score']}" for r in ROWS)
    )
    ds = read_source(str(p), format="csv")
    _expect(validate(ds, SPEC))


def test_jsonl_source_column_pruning(ray_session, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text("\n".join(json.dumps(dict(r, extra="x" * 100)) for r in ROWS))
    ds = read_source(str(p), format="jsonl", columns=["id", "name"])
    assert set(ds.schema().names) == {"id", "name"}


def test_jsonl_documents_dynamic_validation(ray_session, tmp_path):
    """Per-line raw JSON through the dynamic draft-03 path — the
    reference's validate(doc) shape; malformed lines fail validation
    instead of crashing the read."""
    lines = [
        '{"k": 10}',
        '{"k": 99}',
        '{"k": "not a number"}',
        "this is not json",
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines))
    ds = jsonl_documents(str(p))
    spec = {
        "table": "docs",
        "columns": {
            "doc": {
                "jsonSchema": {
                    "type": "object",
                    "properties": {"k": {"type": "integer", "maximum": 50}},
                }
            }
        },
    }
    res = validate(ds, spec)
    verd = res.verdicts_table().to_pandas().set_index("constraint_id")
    assert int(verd.loc["docs.doc.jsonSchema", "n_checked"]) == 4
    assert int(verd.loc["docs.doc.jsonSchema", "n_violations"]) == 3


def test_read_source_rejects_unknown_format():
    import pytest

    from vald.sources import read_source

    with pytest.raises(ValueError, match="unknown source format"):
        read_source("/tmp/x", format="xml")


def test_join_partitions_clamps_to_cluster(ray_session):
    """Ray 2.49 hash-join deadlocks when num_partitions >> CPUs
    (verified in-sandbox); the clamp keeps requests inside the budget."""
    import ray as _ray

    from vald.runtime import join_partitions

    cpus = int(_ray.cluster_resources().get("CPU"))
    assert join_partitions(1000) == cpus
    assert join_partitions(2) == 2
    assert join_partitions(None, default=4) == min(4, cpus)
