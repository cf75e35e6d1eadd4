"""Draft-03 JSON Schema validator over in-memory Python values.

This is the *dynamic path* of the engine: it reproduces the reference's
per-document ``validate(doc) -> result`` semantics (SURVEY.md §0.3 —
reference checkout is empty in this sandbox, so semantics are cited to
the published IETF draft ``zyp-json-schema-03`` §5, which defines the
exact keyword vocabulary BASELINE.json:6 lists: type, required, enum,
pattern, min/max, uniqueItems, ...).

Used (a) by the tabularized conformance suite (FIXTURES.md §3), and
(b) per row on JSON-string columns inside batch kernels (SURVEY.md A1
"dynamic" path). Typed Arrow columns use vald.kernels instead.

Result model [spec03, SURVEY.md §1.1]: verdict + ordered violation list
of ``(path, keyword)``; message text is NOT part of conformance (only
the boolean verdict and which constraint fired are asserted by the
public JSON-Schema-Test-Suite format).
"""

from __future__ import annotations

import re
from typing import Any

__all__ = [
    "validate_value",
    "is_valid",
    "SchemaError",
    "register_schema",
    "unregister_schema",
]


class SchemaError(ValueError):
    """Raised for malformed schemas (bad keyword argument types)."""


_SIMPLE_TYPES = {"string", "number", "integer", "boolean", "object", "array", "null", "any"}


def _type_of(value: Any) -> str:
    # bool must be checked before int: Python bool is a subclass of int,
    # but JSON booleans are not JSON integers [spec03 §5.1].
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (list, tuple)):
        return "array"
    if isinstance(value, dict):
        return "object"
    return "unknown"


def _matches_type(value: Any, t: Any, root: dict, depth: int) -> bool:
    """One entry of a ``type``/``disallow`` union: simple-type name or schema."""
    if isinstance(t, dict):  # nested schema in a union [spec03 §5.1]
        return not _validate(value, t, root, "", depth)
    vt = _type_of(value)
    if t == "any":
        return True
    if t == "number":
        # integers are numbers [spec03 §5.1]
        return vt in ("number", "integer")
    if t == "integer":
        if vt == "integer":
            return True
        # a float with integral value is still type "number" per the suite
        return False
    return vt == t


def _json_equal(a: Any, b: Any) -> bool:
    """Deep equality with JSON semantics: bool != number; 1 == 1.0."""
    ta, tb = _type_of(a), _type_of(b)
    num = ("integer", "number")
    if ta in num and tb in num:
        return float(a) == float(b)
    if ta != tb:
        return False
    if ta == "array":
        return len(a) == len(b) and all(_json_equal(x, y) for x, y in zip(a, b))
    if ta == "object":
        return a.keys() == b.keys() and all(_json_equal(a[k], b[k]) for k in a)
    return a == b


# External-$ref registry (A16 scale-out): an OFFLINE uri → schema-doc
# map — no network, ever. Per-process (register in workers too: the
# jsonSchema kernel accepts a "registry" param and installs it before
# validating, so registered docs travel with the compiled spec).
_SCHEMA_REGISTRY: dict[str, dict] = {}


def register_schema(uri: str, schema: dict) -> None:
    """Register an external schema document under its URI so ``$ref``
    can resolve it offline. A trailing '#' on the URI is ignored."""
    _SCHEMA_REGISTRY[uri.rstrip("#")] = schema


def unregister_schema(uri: str) -> None:
    _SCHEMA_REGISTRY.pop(uri.rstrip("#"), None)


def _resolve_ref(ref: str, root: dict) -> tuple[dict, dict]:
    """Resolve a ``$ref``: intra-document fragments ('#', '#/a/b',
    '#/a/0') against ``root``; external URIs against the offline
    registry. Returns (target_schema, its_document_root) — the document
    root changes on an external hop so nested intra-doc refs resolve
    within the right document."""
    if ref.startswith("#"):
        doc: Any = root
        frag = ref[1:]
    else:
        base, _, frag = ref.partition("#")
        doc = _SCHEMA_REGISTRY.get(base.rstrip("#") if not frag else base)
        if doc is None:
            doc = _SCHEMA_REGISTRY.get(base)
        if doc is None:
            raise SchemaError(
                f"external $ref {ref!r} not registered (offline engine: "
                "use vald.jsonschema.register_schema)"
            )
    node: Any = doc
    frag = frag.lstrip("/")
    if frag:
        for part in frag.split("/"):
            part = part.replace("~1", "/").replace("~0", "~")
            try:
                if isinstance(node, list):
                    node = node[int(part)]
                elif isinstance(node, dict):
                    node = node[part]
                else:
                    raise SchemaError(f"unresolvable $ref {ref!r}")
            except (KeyError, IndexError, ValueError):
                raise SchemaError(f"unresolvable $ref {ref!r}") from None
    if not isinstance(node, dict):
        raise SchemaError(f"$ref {ref!r} does not point at a schema")
    return node, doc


# ---------------------------------------------------------------------------
# format validators [spec03 §5.23] — validation of format is optional per
# spec; we validate the common formats and PASS unknown ones (spec behavior).
# ---------------------------------------------------------------------------

_RE_DATETIME = re.compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
)
_RE_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_RE_TIME = re.compile(r"^\d{2}:\d{2}:\d{2}$")
_RE_EMAIL = re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$")
_RE_IPV4 = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
_RE_HOSTNAME = re.compile(
    r"^(?=.{1,253}$)[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?"
    r"(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$"
)
_RE_URI = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:\S*$")
_RE_COLOR = re.compile(
    r"^(#[0-9a-fA-F]{3}|#[0-9a-fA-F]{6}|[a-zA-Z]+)$"
)


def _check_ipv4(s: str) -> bool:
    m = _RE_IPV4.match(s)
    return bool(m) and all(0 <= int(g) <= 255 for g in m.groups())


def _check_ipv6(s: str) -> bool:
    if ":" not in s:
        return False
    parts = s.split("::")
    if len(parts) > 2:
        return False
    groups = [g for p in parts for g in p.split(":") if g != ""]
    if len(parts) == 1 and len(groups) != 8:
        return False
    if len(parts) == 2 and len(groups) >= 8:
        return False
    return all(re.fullmatch(r"[0-9a-fA-F]{1,4}", g) for g in groups)


def _check_regex(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


FORMAT_CHECKS = {
    "date-time": lambda s: bool(_RE_DATETIME.match(s)),
    "date": lambda s: bool(_RE_DATE.match(s)),
    "time": lambda s: bool(_RE_TIME.match(s)),
    "email": lambda s: bool(_RE_EMAIL.match(s)),
    "ip-address": _check_ipv4,  # draft-03 name
    "ipv4": _check_ipv4,  # draft-04 name
    "ipv6": _check_ipv6,
    "host-name": lambda s: bool(_RE_HOSTNAME.match(s)),
    "hostname": lambda s: bool(_RE_HOSTNAME.match(s)),
    "uri": lambda s: bool(_RE_URI.match(s)),
    "regex": _check_regex,
    "color": lambda s: bool(_RE_COLOR.match(s)),
    "utc-millisec": lambda s: True,  # applies to numbers; pass strings too
}


_MAX_DEPTH = 64


def _validate(value: Any, schema: dict, root: dict, path: str, depth: int) -> list[tuple[str, str]]:
    """Recursive descent; returns ordered list of (path, keyword) errors."""
    if depth > _MAX_DEPTH:
        raise SchemaError("schema recursion exceeds max depth")
    if not isinstance(schema, dict):
        raise SchemaError(f"schema must be an object, got {type(schema).__name__}")

    if "$ref" in schema:
        target, new_root = _resolve_ref(schema["$ref"], root)
        return _validate(value, target, new_root, path, depth + 1)

    errors: list[tuple[str, str]] = []
    vt = _type_of(value)

    # --- type [spec03 §5.1] ---
    t = schema.get("type")
    if t is not None:
        alts = t if isinstance(t, list) else [t]
        if not any(_matches_type(value, a, root, depth + 1) for a in alts):
            errors.append((path, "type"))

    # --- disallow [spec03 §5.25] ---
    d = schema.get("disallow")
    if d is not None:
        alts = d if isinstance(d, list) else [d]
        if any(_matches_type(value, a, root, depth + 1) for a in alts):
            errors.append((path, "disallow"))

    # --- enum [spec03 §5.19] ---
    if "enum" in schema:
        if not any(_json_equal(value, e) for e in schema["enum"]):
            errors.append((path, "enum"))

    # --- extends [spec03 §5.26] ---
    ext = schema.get("extends")
    if ext is not None:
        for sub in ext if isinstance(ext, list) else [ext]:
            errors.extend(_validate(value, sub, root, path, depth + 1))

    # --- draft-04 combinators (accepted for forward-compat, SURVEY A14) ---
    if "allOf" in schema:
        for sub in schema["allOf"]:
            errors.extend(_validate(value, sub, root, path, depth + 1))
    if "anyOf" in schema:
        if not any(not _validate(value, sub, root, path, depth + 1) for sub in schema["anyOf"]):
            errors.append((path, "anyOf"))
    if "oneOf" in schema:
        n_ok = sum(not _validate(value, sub, root, path, depth + 1) for sub in schema["oneOf"])
        if n_ok != 1:
            errors.append((path, "oneOf"))
    if "not" in schema:
        if not _validate(value, schema["not"], root, path, depth + 1):
            errors.append((path, "not"))

    # --- numeric keywords [spec03 §5.9-5.12, §5.24] ---
    if vt in ("integer", "number"):
        if "minimum" in schema:
            m = schema["minimum"]
            if schema.get("exclusiveMinimum", False):
                if not value > m:
                    errors.append((path, "minimum"))
            elif not value >= m:
                errors.append((path, "minimum"))
        if "maximum" in schema:
            m = schema["maximum"]
            if schema.get("exclusiveMaximum", False):
                if not value < m:
                    errors.append((path, "maximum"))
            elif not value <= m:
                errors.append((path, "maximum"))
        for kw in ("divisibleBy", "multipleOf"):  # draft-03 / draft-04 names
            if kw in schema:
                k = schema[kw]
                if k == 0:
                    raise SchemaError(f"{kw} must be nonzero")
                q = value / k
                if abs(q - round(q)) > 1e-9:
                    errors.append((path, kw))

    # --- string keywords [spec03 §5.16-5.18] ---
    if vt == "string":
        if "minLength" in schema and len(value) < schema["minLength"]:
            errors.append((path, "minLength"))
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            errors.append((path, "maxLength"))
        if "pattern" in schema:
            # ECMA-262 regex, unanchored search [spec03 §5.16]
            if not re.search(schema["pattern"], value):
                errors.append((path, "pattern"))
        if "format" in schema:
            fmt = FORMAT_CHECKS.get(schema["format"])
            if fmt is not None and not fmt(value):
                errors.append((path, "format"))

    # --- array keywords [spec03 §5.5-5.6, §5.13-5.15] ---
    if vt == "array":
        if "minItems" in schema and len(value) < schema["minItems"]:
            errors.append((path, "minItems"))
        if "maxItems" in schema and len(value) > schema["maxItems"]:
            errors.append((path, "maxItems"))
        if schema.get("uniqueItems", False):
            seen: list[Any] = []
            dup = False
            for item in value:
                if any(_json_equal(item, s) for s in seen):
                    dup = True
                    break
                seen.append(item)
            if dup:
                errors.append((path, "uniqueItems"))
        items = schema.get("items")
        add_items = schema.get("additionalItems")
        if isinstance(items, dict):
            for i, item in enumerate(value):
                errors.extend(_validate(item, items, root, f"{path}[{i}]", depth + 1))
        elif isinstance(items, list):  # tuple typing [spec03 §5.5]
            for i, item in enumerate(value):
                if i < len(items):
                    errors.extend(_validate(item, items[i], root, f"{path}[{i}]", depth + 1))
                elif add_items is False:
                    errors.append((f"{path}[{i}]", "additionalItems"))
                elif isinstance(add_items, dict):
                    errors.extend(_validate(item, add_items, root, f"{path}[{i}]", depth + 1))

    # --- object keywords [spec03 §5.2-5.4, §5.7-5.8] ---
    if vt == "object":
        props = schema.get("properties", {})
        pattern_props = schema.get("patternProperties", {})
        add_props = schema.get("additionalProperties")
        for name, sub in props.items():
            child = f"{path}.{name}" if path else name
            if name in value:
                errors.extend(_validate(value[name], sub, root, child, depth + 1))
            elif isinstance(sub, dict) and sub.get("required", False):
                # draft-03: required is a boolean in the property schema [spec03 §5.7]
                errors.append((child, "required"))
        # draft-04 spelling: required as a list of names on the parent
        req = schema.get("required")
        if isinstance(req, list):
            for name in req:
                if name not in value:
                    errors.append((f"{path}.{name}" if path else name, "required"))
        for pat, sub in pattern_props.items():
            for name, v in value.items():
                if re.search(pat, name):
                    child = f"{path}.{name}" if path else name
                    errors.extend(_validate(v, sub, root, child, depth + 1))
        if add_props is not None:
            for name, v in value.items():
                if name in props:
                    continue
                if any(re.search(p, name) for p in pattern_props):
                    continue
                child = f"{path}.{name}" if path else name
                if add_props is False:
                    errors.append((child, "additionalProperties"))
                elif isinstance(add_props, dict):
                    errors.extend(_validate(v, add_props, root, child, depth + 1))
        deps = schema.get("dependencies", {})
        for name, dep in deps.items():
            if name not in value:
                continue
            child = f"{path}.{name}" if path else name
            if isinstance(dep, str):
                if dep not in value:
                    errors.append((child, "dependencies"))
            elif isinstance(dep, list):
                if any(d not in value for d in dep):
                    errors.append((child, "dependencies"))
            elif isinstance(dep, dict):  # schema dependency
                errors.extend(_validate(value, dep, root, path, depth + 1))
        if "minProperties" in schema and len(value) < schema["minProperties"]:
            errors.append((path, "minProperties"))
        if "maxProperties" in schema and len(value) > schema["maxProperties"]:
            errors.append((path, "maxProperties"))

    return errors


def validate_value(value: Any, schema: dict) -> list[tuple[str, str]]:
    """Validate one JSON value; returns ordered [(path, keyword)] errors."""
    return _validate(value, schema, schema, "", 0)


def is_valid(value: Any, schema: dict) -> bool:
    return not validate_value(value, schema)
