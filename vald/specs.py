"""Bundled ConstraintSet specs for the driver testdata tables
(FIXTURES.md §1 — verified-clean TPC-H-ish tables). These power
``__ray_entry__.entry()``'s flagship run and the §2.C query catalog.

Constraint values mirror the verified facts in FIXTURES.md §1 (enums,
ranges, patterns, key relationships), so the clean testdata must yield
zero violations — the null-test direction of the correctness gate."""

from __future__ import annotations

ORDERS_SPEC: dict = {
    "table": "orders",
    "row_ref": ["o_orderkey"],
    "partition_by": "o_orderkey",
    "num_partitions": 8,
    "columns": {
        "o_orderkey": {"required": True},
        "o_custkey": {"required": True},
        "o_orderstatus": {"enum": ["F", "O", "P"]},
        "o_totalprice": {"minimum": 0.0},
        "o_orderpriority": {
            "enum": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        },
    },
    "checks": [
        {"kind": "unique", "columns": ["o_orderkey"]},
        {
            "kind": "refint",
            "columns": ["o_custkey"],
            "parent_table": "customer",
            "parent_columns": ["c_custkey"],
        },
    ],
}

LINEITEM_SPEC: dict = {
    "table": "lineitem",
    "row_ref": ["l_orderkey", "l_linenumber"],
    "partition_by": "l_orderkey",
    "num_partitions": 8,
    "columns": {
        "l_returnflag": {"enum": ["A", "N", "R"]},
        "l_linestatus": {"enum": ["O", "F"]},
        "l_discount": {"minimum": 0.0, "maximum": 0.1},
        "l_tax": {"minimum": 0.0},
        "l_quantity": {"minimum": 0.0, "exclusiveMinimum": True},
    },
    "checks": [
        {
            "kind": "refint",
            "columns": ["l_orderkey"],
            "parent_table": "orders",
            "parent_columns": ["o_orderkey"],
        },
        # outlier screen at the table's own full range — provably clean
        # on any data; exercises the quantile_bounds kind in entry()
        {
            "kind": "quantile_bounds",
            "column": "l_extendedprice",
            "lower_q": 0.0,
            "upper_q": 1.0,
        },
    ],
}

CUSTOMER_SPEC: dict = {
    "table": "customer",
    "row_ref": ["c_custkey"],
    "partition_by": "c_custkey",
    "columns": {
        "c_custkey": {"required": True},
        "c_name": {"pattern": "^Customer#[0-9]+$"},
        "c_mktsegment": {"required": True},
    },
    "checks": [{"kind": "unique", "columns": ["c_custkey"]}],
}

DOCUMENTS_SPEC: dict = {
    "table": "documents",
    "row_ref": ["doc_id"],
    "partition_by": "doc_id",
    "columns": {
        "doc_id": {"required": True},
        "text": {"required": True, "minLength": 1},
        "lang": {"enum": ["en", "de", "es", "fr", "zh"]},
        "n_chars": {"minimum": 0},
    },
    "checks": [
        # cross-field consistency (A12): length(text) == n_chars
        {
            "kind": "compare",
            "id": "text_len",
            "constraint_id": "documents.text_len.dependency",
            "left": {"fn": "length", "column": "text"},
            "op": "==",
            "right": {"column": "n_chars"},
        },
        {"kind": "unique", "columns": ["doc_id"]},
        # text is fully populated in the clean data: a 0-null-rate
        # completeness threshold is the null-test direction
        {"kind": "completeness", "column": "text", "max_null_rate": 0.0},
        # unique doc_id determines anything — trivially-true FD keeps
        # the fd kind on the entry() smoke path
        {"kind": "fd", "columns": ["doc_id"], "dependent": "lang"},
    ],
}

EVENTS_SPEC: dict = {
    "table": "events",
    "row_ref": ["event_id"],
    "partition_by": "user_id",
    "columns": {
        "event_id": {"required": True},
        "event_type": {"enum": ["click", "view", "purchase", "signup", "error"]},
        "props": {
            # dynamic path (A1): JSON-string column checked per row
            "jsonSchema": {
                "type": "object",
                "properties": {"k": {"type": "integer", "minimum": 0}},
            }
        },
    },
    "checks": [
        {"kind": "unique", "columns": ["event_id"]},
        # event time never moves backward within a user's stream in
        # ingestion (event_id) order — holds on the generated log, so
        # this is the monotonic kind's null direction on the entry()
        # smoke path (tests/test_monotonic.py covers the fire side)
        {"kind": "monotonic", "key": "user_id", "order": "event_id", "column": "ts"},
    ],
}

EMBEDDINGS_SPEC: dict = {
    "table": "embeddings",
    "row_ref": ["vec_id"],
    "partition_by": "vec_id",
    "columns": {
        "vec_id": {"required": True},
        "embedding": {"minItems": 64, "maxItems": 64},
    },
    "checks": [{"kind": "unique", "columns": ["vec_id"]}],
}

ALL_SPECS = {
    "orders": ORDERS_SPEC,
    "lineitem": LINEITEM_SPEC,
    "customer": CUSTOMER_SPEC,
    "documents": DOCUMENTS_SPEC,
    "events": EVENTS_SPEC,
    "embeddings": EMBEDDINGS_SPEC,
}

# columns each spec actually touches → pruned reads (SURVEY.md §4.3)
SPEC_COLUMNS = {
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    "lineitem": [
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        "l_discount",
        "l_tax",
        "l_quantity",
        "l_extendedprice",
    ],
    "customer": ["c_custkey", "c_name", "c_mktsegment"],
    "documents": ["doc_id", "text", "lang", "n_chars"],
    "events": ["event_id", "user_id", "event_type", "props", "ts"],
    "embeddings": ["vec_id", "embedding"],
}
