"""Vectorized constraint kernels over pyarrow batches (SURVEY.md §2.A).

Each kernel maps one JSON-Schema keyword (the reference's per-document
vocabulary, [spec03 §5] / BASELINE.json:6) to a pyarrow.compute
expression over a column, returning a numpy bool mask where True = the
row PASSES.

Null semantics of the tabular path (documented design decision,
SURVEY.md §5.2.2): an Arrow NULL cell means "property absent" — it
fails ``required`` and PASSES every other keyword (matching JSON Schema,
where keywords other than required constrain only *present* values, and
SQL, where comparisons with NULL are not violations). An explicit JSON
``null`` inside a JSON-string column is a present value of type "null"
and is handled by the dynamic path (vald.jsonschema).

NaN policy (SURVEY.md §5.2.2): JSON has no NaN; NaN fails
minimum/maximum and divisibleBy, and is counted as null by profiles.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import jsonschema as js

__all__ = ["KERNELS", "eval_kernel", "observed_strings", "null_mask", "get_column"]


def get_column(t: pa.Table, name: str):
    """Column access with dotted nested paths (A10): ``a.b.c`` resolves
    through struct fields via pc.struct_field — plan-time flattening of
    the reference's recursive ``properties`` descent."""
    if name in t.column_names:
        return t[name]
    if "." in name:
        root, *rest = name.split(".")
        col = t[root]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.struct_field(col, rest)
    raise KeyError(name)


def _to_np(mask: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Boolean Arrow array → numpy bool, Arrow-null → False."""
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return np.asarray(mask.fill_null(False).to_numpy(zero_copy_only=False), dtype=bool)


def null_mask(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    m = _to_np(pc.is_null(col))
    # NaN counts as null for profile/required purposes (NaN policy above)
    if pa.types.is_floating(col.type):
        vals = np.asarray(col.to_numpy(zero_copy_only=False), dtype=float)
        m = m | np.isnan(vals)
    return m


def _pass_nulls(col: pa.ChunkedArray | pa.Array, ok: np.ndarray) -> np.ndarray:
    return ok | _to_np(pc.is_null(col))


def observed_strings(col: pa.ChunkedArray | pa.Array, idx: np.ndarray) -> list[str]:
    """Stringify the failing values for violation rows (cold path).
    Always truncated to 120 chars so a 64 KiB document body never lands
    in the violation stream."""
    if len(idx) == 0:
        return []
    taken = col.take(pa.array(idx, type=pa.int64()))
    try:
        vals = pc.cast(taken, pa.string()).to_pylist()
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        vals = [None if v is None else str(v) for v in taken.to_pylist()]
    return [
        "<null>" if s is None else (s if len(s) <= 120 else s[:117] + "...")
        for s in vals
    ]


# ---------------------------------------------------------------------------
# kernels — fn(col, params) -> np.ndarray[bool]  (True = pass)
# ---------------------------------------------------------------------------


def k_required(col, params) -> np.ndarray:
    # [spec03 §5.7] — the ONE keyword where null fails
    ok = _to_np(pc.is_valid(col))
    if pa.types.is_floating(col.type):
        vals = np.asarray(col.to_numpy(zero_copy_only=False), dtype=float)
        ok = ok & ~np.isnan(vals)
    return ok


def k_enum(col, params) -> np.ndarray:
    # [spec03 §5.19]
    values = params["values"]
    ok = _to_np(pc.is_in(col, value_set=pa.array(values, type=col.type)))
    return _pass_nulls(col, ok)


_RE2_UNSAFE = re.compile(r"\(\?<?[=!]|\\[1-9]|\(\?P=")  # lookaround / backrefs


def compile_pattern(pattern: str) -> tuple[str | None, "re.Pattern | None"]:
    """Split a pattern into (re2_safe_pattern, python_fallback)."""
    if _RE2_UNSAFE.search(pattern):
        return None, re.compile(pattern)
    return pattern, None


def k_pattern(col, params) -> np.ndarray:
    # [spec03 §5.16] — unanchored search, ECMA-ish. RE2 via Arrow when safe.
    pattern = params["pattern"]
    re2, pyre = params.get("_compiled") or compile_pattern(pattern)
    if re2 is not None:
        try:
            ok = _to_np(pc.match_substring_regex(col, re2))
            return _pass_nulls(col, ok)
        except pa.ArrowInvalid:
            pyre = re.compile(pattern)
    assert pyre is not None
    vals = col.to_pylist()
    ok = np.fromiter(
        (v is None or bool(pyre.search(v)) for v in vals), dtype=bool, count=len(vals)
    )
    return ok


def _cmp(col, bound, op):
    ok = _to_np(op(col, pa.scalar(bound)))
    if pa.types.is_floating(col.type):
        vals = np.asarray(col.to_numpy(zero_copy_only=False), dtype=float)
        ok = ok & ~np.isnan(vals)  # NaN fails bounds, but passes via null? No:
        # NaN policy: NaN FAILS min/max. is_null(NaN)=False in Arrow, so the
        # _pass_nulls below only rescues true nulls.
    return _pass_nulls(col, ok)


def k_minimum(col, params) -> np.ndarray:
    # [spec03 §5.9, §5.11]
    op = pc.greater if params.get("exclusive", False) else pc.greater_equal
    return _cmp(col, params["value"], op)


def k_maximum(col, params) -> np.ndarray:
    # [spec03 §5.10, §5.12]
    op = pc.less if params.get("exclusive", False) else pc.less_equal
    return _cmp(col, params["value"], op)


def _utf8_len(col):
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        return pc.binary_length(col)
    return pc.utf8_length(col)


def k_min_length(col, params) -> np.ndarray:
    # [spec03 §5.17] — code points, matching len() in Python/DuckDB length()
    ok = _to_np(pc.greater_equal(_utf8_len(col), pa.scalar(params["value"])))
    return _pass_nulls(col, ok)


def k_max_length(col, params) -> np.ndarray:
    # [spec03 §5.18]
    ok = _to_np(pc.less_equal(_utf8_len(col), pa.scalar(params["value"])))
    return _pass_nulls(col, ok)


def k_min_items(col, params) -> np.ndarray:
    # [spec03 §5.13] — list columns
    ok = _to_np(pc.greater_equal(pc.list_value_length(col), pa.scalar(params["value"])))
    return _pass_nulls(col, ok)


def k_max_items(col, params) -> np.ndarray:
    # [spec03 §5.14]
    ok = _to_np(pc.less_equal(pc.list_value_length(col), pa.scalar(params["value"])))
    return _pass_nulls(col, ok)


def k_unique_items(col, params) -> np.ndarray:
    # [spec03 §5.15] — per-row uniqueness WITHIN one array value.
    # Deep equality on nested values is not vectorizable (SURVEY §7.8.3);
    # fast path for primitive lists via set(), fallback to _json_equal.
    out = np.ones(len(col), dtype=bool)
    for i, v in enumerate(col.to_pylist()):
        if v is None:
            continue
        try:
            out[i] = len(set(v)) == len(v)
        except TypeError:  # unhashable (nested lists/dicts)
            seen: list[Any] = []
            ok = True
            for item in v:
                if any(js._json_equal(item, s) for s in seen):
                    ok = False
                    break
                seen.append(item)
            out[i] = ok
    return out


def k_divisible_by(col, params) -> np.ndarray:
    # [spec03 §5.24] draft-03 divisibleBy == draft-04 multipleOf
    k = params["value"]
    if k == 0:
        raise ValueError("divisibleBy must be nonzero")
    vals = np.asarray(
        pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False), dtype=float
    )
    with np.errstate(invalid="ignore"):
        q = vals / k
        ok = np.abs(q - np.round(q)) <= 1e-9
    ok = np.where(np.isnan(vals), False, ok)  # NaN fails; nulls rescued below
    return _pass_nulls(col, ok)


def k_type(col, params) -> np.ndarray:
    """A1 physical type check on a typed column.

    For typed Arrow columns the type is uniform — this is effectively a
    plan-time check (SURVEY A1) — but we evaluate it per batch so the
    verdict row carries n_checked. Integer-valued floats count as
    "integer"-compatible only when allow_integral_float is set.
    """
    want = params["types"] if isinstance(params["types"], list) else [params["types"]]
    t = col.type
    ok_type = False
    for w in want:
        if w == "any":
            ok_type = True
        elif w == "string" and (pa.types.is_string(t) or pa.types.is_large_string(t)):
            ok_type = True
        elif w == "integer" and pa.types.is_integer(t):
            ok_type = True
        elif w == "number" and (pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)):
            ok_type = True
        elif w == "boolean" and pa.types.is_boolean(t):
            ok_type = True
        elif w == "array" and (pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)):
            ok_type = True
        elif w == "object" and pa.types.is_struct(t):
            ok_type = True
        elif w == "timestamp" and pa.types.is_timestamp(t):
            ok_type = True
        elif w == "binary" and (pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            ok_type = True
    if ok_type:
        return np.ones(len(col), dtype=bool)
    # "integer" against a float column: integral values pass when allowed
    if "integer" in want and pa.types.is_floating(t) and params.get("allow_integral_float", True):
        vals = np.asarray(col.to_numpy(zero_copy_only=False), dtype=float)
        with np.errstate(invalid="ignore"):
            ok = (vals == np.round(vals)) & ~np.isnan(vals)
        return _pass_nulls(col, ok)
    return _pass_nulls(col, np.zeros(len(col), dtype=bool))


def k_format(col, params) -> np.ndarray:
    # [spec03 §5.23] — semantic string formats; unknown formats pass.
    fmt = params["format"]
    fn = js.FORMAT_CHECKS.get(fmt)
    if fn is None:
        return np.ones(len(col), dtype=bool)
    vals = col.to_pylist()
    return np.fromiter(
        (v is None or (isinstance(v, str) and fn(v)) for v in vals),
        dtype=bool,
        count=len(vals),
    )


def k_json_schema(col, params) -> np.ndarray:
    """A1 dynamic path: per-row json.loads + draft-03 validation on a
    JSON-string column. Schema compiled once (params carry the dict).
    ``params["registry"]`` (uri → schema doc) installs external-$ref
    documents in THIS worker process so refs resolve offline (A16)."""
    schema = params["schema"]
    for uri, doc in (params.get("registry") or {}).items():
        js.register_schema(uri, doc)
    out = np.ones(len(col), dtype=bool)
    for i, v in enumerate(col.to_pylist()):
        if v is None:
            continue
        try:
            doc = json.loads(v)
        except (json.JSONDecodeError, TypeError):
            out[i] = False
            continue
        out[i] = js.is_valid(doc, schema)
    return out


KERNELS: dict[str, Callable] = {
    "required": k_required,
    "enum": k_enum,
    "pattern": k_pattern,
    "minimum": k_minimum,
    "maximum": k_maximum,
    "minLength": k_min_length,
    "maxLength": k_max_length,
    "minItems": k_min_items,
    "maxItems": k_max_items,
    "uniqueItems": k_unique_items,
    "divisibleBy": k_divisible_by,
    "multipleOf": k_divisible_by,
    "type": k_type,
    "format": k_format,
    "jsonSchema": k_json_schema,
}


def eval_kernel(keyword: str, col, params: dict) -> np.ndarray:
    return KERNELS[keyword](col, params)


# ---------------------------------------------------------------------------
# cross-field expression mini-language (A12 dependencies / B15 scalar fns)
# operand := {"column": name} | {"const": v} | {"fn": f, "column": name}
# fns: length (utf8), list_length, abs, lower, upper, year, json_extract_int
# ---------------------------------------------------------------------------

_EXPR_FNS = {
    "length": lambda c: pc.utf8_length(c),
    "list_length": lambda c: pc.list_value_length(c),
    "abs": lambda c: pc.abs(c),
    "lower": lambda c: pc.utf8_lower(c),
    "upper": lambda c: pc.utf8_upper(c),
    "round": lambda c: pc.round(c),
    "year": lambda c: pc.year(c),
    "file_ext": lambda c: pc.replace_substring_regex(c, r"^.*\.", ""),
}


def eval_operand(t: pa.Table, op: dict):
    if "const" in op:
        return pa.scalar(op["const"])
    col = t[op["column"]]
    if "fn" in op:
        return _EXPR_FNS[op["fn"]](col)
    return col


_CMP_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def eval_compare(t: pa.Table, left: dict, right: dict, op: str) -> np.ndarray:
    """Row mask for a cross-field comparison; null operands pass (SQL-ish)."""
    lv, rv = eval_operand(t, left), eval_operand(t, right)
    ok = _to_np(_CMP_OPS[op](lv, rv))
    anynull = np.zeros(len(t), dtype=bool)
    for v in (lv, rv):
        if not isinstance(v, pa.Scalar):
            anynull |= _to_np(pc.is_null(v))
    return ok | anynull
