"""The queries package split (VERDICT r3 item 6) is a pure refactor:
every pre-split QUERIES / ORACLE_SQL entry must survive byte-identical
(keys, oracle SQL bytes, callable names). The catalog may GROW after
the split — new entries are allowed, drops/edits of snapshot entries
are not."""

import hashlib
import json
import os

from vald.queries import ORACLE_SQL, QUERIES

SNAP = os.path.join(os.path.dirname(__file__), "data", "queries_registry_snapshot.json")


def test_presplit_registry_preserved():
    snap = json.load(open(SNAP))
    assert set(snap["queries_keys"]) <= set(QUERIES)
    assert set(snap["oracle_keys"]) <= set(ORACLE_SQL)
    for k in snap["oracle_keys"]:
        assert (
            hashlib.sha256(ORACLE_SQL[k].encode()).hexdigest() == snap["oracle_sha"][k]
        ), k
    for k, name in snap["fn_names"].items():
        assert QUERIES[k].__name__ == name, k


def test_every_query_importable_from_package_root():
    import vald.queries as Q

    for name, fn in QUERIES.items():
        assert getattr(Q, fn.__name__) is fn, name
