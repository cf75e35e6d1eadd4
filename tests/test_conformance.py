"""Conformance runner (SURVEY.md §5.2.3, FIXTURES.md §3).

Cases are in the official JSON-Schema-Test-Suite FILE FORMAT
(`[{description, schema, tests: [{description, data, valid}]}]`),
rebuilt from the draft-03 spec semantics. Each group is tabularized:
all `data` instances become rows of a one-column table ``v`` (natural
Arrow type when homogeneous, else JSON-encoded strings exercising the
dynamic A1 path), the schema compiles to a ConstraintSet on ``v``, and
the per-row verdict vector must equal the `valid` flags — asserted BOTH
through the row kernels directly and through a local-Ray end-to-end
validate() run.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from vald.ir import compile_value_schema

CASES_PATH = os.path.join(os.path.dirname(__file__), "conformance", "draft3_cases.json")
with open(CASES_PATH) as f:
    GROUPS = json.load(f)


def tabularize(instances: list) -> tuple[pa.Table, bool]:
    """Instances → one-column table 'v'. Returns (table, parse_json).

    Objects always go through the JSON-string path: Arrow struct
    columns UNIFY field sets across rows (absent keys become nulls),
    which destroys the present/absent distinction that required /
    additionalProperties / dependencies check."""
    if not any(isinstance(x, dict) for x in instances):
        try:
            arr = pa.array(instances)
            if arr.type != pa.null() and not pa.types.is_union(arr.type):
                return pa.table({"v": arr}), False
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            pass
    return (
        pa.table({"v": pa.array([json.dumps(x) for x in instances], type=pa.string())}),
        True,
    )


@pytest.mark.parametrize("group", GROUPS, ids=[g["description"] for g in GROUPS])
def test_conformance_kernels(group):
    instances = [t["data"] for t in group["tests"]]
    expected = [t["valid"] for t in group["tests"]]
    table, parse_json = tabularize(instances)
    cs = compile_value_schema(group["schema"], column="v", parse_json=parse_json)
    got = cs.row_checks[0].eval(table)
    for t, e, g in zip(group["tests"], expected, got.tolist()):
        assert g == e, f"{group['description']} :: {t['description']}: got {g}, want {e}"


def test_conformance_end_to_end(ray_session):
    """Every group through the full Ray pipeline in one pass each."""
    import ray.data

    from vald.pipeline import validate

    total_bad = 0
    for group in GROUPS:
        instances = [t["data"] for t in group["tests"]]
        expected = np.array([t["valid"] for t in group["tests"]])
        table, parse_json = tabularize(instances)
        table = table.append_column("row_id", pa.array(range(len(table)), type=pa.int64()))
        cs = compile_value_schema(group["schema"], column="v", parse_json=parse_json)
        cs.row_ref_cols = ["row_id"]
        res = validate(ray.data.from_arrow(table), cs)
        viol = res.violations_table()
        bad_rows = set(int(r) for r in viol["row_ref"].to_pylist())
        got = np.array([i not in bad_rows for i in range(len(instances))])
        mism = np.flatnonzero(got != expected)
        assert len(mism) == 0, (group["description"], mism.tolist())
        total_bad += len(bad_rows)
    assert total_bad > 0  # sanity: the suite exercises failures
