"""The queries package split (VERDICT r3 item 6) is a pure refactor:
QUERIES / ORACLE_SQL must match the pre-split snapshot exactly —
same keys, same oracle SQL bytes, same callable names."""

import hashlib
import json
import os

from vald.queries import ORACLE_SQL, QUERIES

SNAP = os.path.join(os.path.dirname(__file__), "data", "queries_registry_snapshot.json")


def test_registry_identical_to_presplit_snapshot():
    snap = json.load(open(SNAP))
    assert sorted(QUERIES) == snap["queries_keys"]
    assert sorted(ORACLE_SQL) == snap["oracle_keys"]
    for k, sql in ORACLE_SQL.items():
        assert hashlib.sha256(sql.encode()).hexdigest() == snap["oracle_sha"][k], k
    assert {k: f.__name__ for k, f in QUERIES.items()} == snap["fn_names"]


def test_every_query_importable_from_package_root():
    import vald.queries as Q

    for name, fn in QUERIES.items():
        assert getattr(Q, fn.__name__) is fn, name
