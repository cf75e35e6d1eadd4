"""Unit tests for the draft-03 dynamic validator (SURVEY.md §5.2.2)."""

import pytest

from vald.jsonschema import SchemaError, is_valid, validate_value


def test_type_simple():
    assert is_valid("x", {"type": "string"})
    assert not is_valid(1, {"type": "string"})
    assert is_valid(1, {"type": "integer"})
    assert is_valid(1, {"type": "number"})  # integers are numbers
    assert not is_valid(1.5, {"type": "integer"})
    assert not is_valid(True, {"type": "integer"})  # bool is not int in JSON
    assert is_valid(True, {"type": "boolean"})
    assert is_valid(None, {"type": "null"})
    assert not is_valid(None, {"type": "string"})
    assert is_valid({"a": 1}, {"type": "object"})
    assert is_valid([1], {"type": "array"})
    assert is_valid(object(), {"type": "any"}) is False or True  # any passes JSON values
    assert is_valid(123, {"type": "any"})


def test_type_union_and_schema_union():
    assert is_valid(1, {"type": ["string", "integer"]})
    assert not is_valid(1.5, {"type": ["string", "integer"]})
    # union containing a schema [spec03 §5.1]
    assert is_valid(5, {"type": ["string", {"type": "integer", "minimum": 3}]})
    assert not is_valid(1, {"type": ["string", {"type": "integer", "minimum": 3}]})


def test_required_draft03_and_draft04():
    schema3 = {"type": "object", "properties": {"a": {"required": True}}}
    assert not is_valid({}, schema3)
    assert is_valid({"a": 1}, schema3)
    schema4 = {"type": "object", "required": ["a"]}
    assert not is_valid({}, schema4)
    assert is_valid({"a": 1}, schema4)


def test_enum_json_equality():
    assert is_valid(1, {"enum": [1, 2]})
    assert is_valid(1.0, {"enum": [1]})  # 1 == 1.0 in JSON
    assert not is_valid(True, {"enum": [1]})  # bool != number
    assert is_valid([1, 2], {"enum": [[1, 2]]})
    assert not is_valid([2, 1], {"enum": [[1, 2]]})
    assert is_valid({"a": 1}, {"enum": [{"a": 1}]})


def test_numeric_bounds():
    assert is_valid(3, {"minimum": 3})
    assert not is_valid(3, {"minimum": 3, "exclusiveMinimum": True})
    assert is_valid(3, {"maximum": 3})
    assert not is_valid(3, {"maximum": 3, "exclusiveMaximum": True})
    assert not is_valid(2.9, {"minimum": 3})
    # non-numbers ignore numeric keywords
    assert is_valid("x", {"minimum": 3})


def test_divisible_by():
    assert is_valid(9, {"divisibleBy": 3})
    assert not is_valid(10, {"divisibleBy": 3})
    assert is_valid(0.75, {"multipleOf": 0.25})
    with pytest.raises(SchemaError):
        validate_value(3, {"divisibleBy": 0})


def test_string_keywords():
    assert is_valid("abc", {"minLength": 3, "maxLength": 3})
    assert not is_valid("ab", {"minLength": 3})
    assert not is_valid("abcd", {"maxLength": 3})
    assert is_valid("xaby", {"pattern": "ab"})  # unanchored search
    assert not is_valid("xy", {"pattern": "ab"})
    assert is_valid(42, {"minLength": 3})  # non-strings ignore string keywords


def test_array_keywords():
    assert is_valid([1, 2], {"minItems": 2, "maxItems": 2})
    assert not is_valid([1], {"minItems": 2})
    assert not is_valid([1, 2, 3], {"maxItems": 2})
    assert is_valid([1, 2], {"uniqueItems": True})
    assert not is_valid([1, 1], {"uniqueItems": True})
    assert not is_valid([1, 1.0], {"uniqueItems": True})  # 1 == 1.0
    assert is_valid([1, True], {"uniqueItems": True})  # bool != 1
    assert not is_valid([{"a": 1}, {"a": 1}], {"uniqueItems": True})
    assert is_valid([[1], [2]], {"uniqueItems": True})


def test_items_and_additional_items():
    assert is_valid([1, 2], {"items": {"type": "integer"}})
    assert not is_valid([1, "x"], {"items": {"type": "integer"}})
    tup = {"items": [{"type": "integer"}, {"type": "string"}], "additionalItems": False}
    assert is_valid([1, "a"], tup)
    assert not is_valid([1, "a", 2], tup)
    tup2 = {"items": [{"type": "integer"}], "additionalItems": {"type": "string"}}
    assert is_valid([1, "a", "b"], tup2)
    assert not is_valid([1, "a", 2], tup2)


def test_properties_nested_paths():
    schema = {
        "type": "object",
        "properties": {"a": {"type": "object", "properties": {"b": {"type": "integer"}}}},
    }
    errs = validate_value({"a": {"b": "no"}}, schema)
    assert errs == [("a.b", "type")]


def test_additional_properties_and_pattern_properties():
    schema = {
        "properties": {"a": {}},
        "patternProperties": {"^x": {"type": "integer"}},
        "additionalProperties": False,
    }
    assert is_valid({"a": 1, "x1": 2}, schema)
    assert not is_valid({"b": 1}, schema)
    assert not is_valid({"x1": "s"}, schema)
    schema2 = {"properties": {"a": {}}, "additionalProperties": {"type": "integer"}}
    assert is_valid({"a": "s", "b": 2}, schema2)
    assert not is_valid({"b": "s"}, schema2)


def test_dependencies():
    assert not is_valid({"a": 1}, {"dependencies": {"a": "b"}})
    assert is_valid({"a": 1, "b": 2}, {"dependencies": {"a": "b"}})
    assert not is_valid({"a": 1, "b": 2}, {"dependencies": {"a": ["b", "c"]}})
    dep_schema = {"dependencies": {"a": {"properties": {"b": {"type": "integer"}}}}}
    assert not is_valid({"a": 1, "b": "s"}, dep_schema)
    assert is_valid({"b": "s"}, dep_schema)


def test_disallow_extends():
    assert not is_valid(1, {"disallow": "integer"})
    assert is_valid("x", {"disallow": "integer"})
    assert not is_valid("x", {"disallow": ["integer", "string"]})
    ext = {"type": "object", "extends": {"properties": {"a": {"required": True}}}}
    assert not is_valid({}, ext)
    assert is_valid({"a": 1}, ext)


def test_draft04_combinators():
    assert is_valid(5, {"allOf": [{"minimum": 3}, {"maximum": 10}]})
    assert not is_valid(11, {"allOf": [{"minimum": 3}, {"maximum": 10}]})
    assert is_valid("x", {"anyOf": [{"type": "integer"}, {"type": "string"}]})
    assert not is_valid([], {"anyOf": [{"type": "integer"}, {"type": "string"}]})
    assert is_valid(5, {"oneOf": [{"minimum": 10}, {"maximum": 6}]})
    assert not is_valid(5, {"oneOf": [{"minimum": 3}, {"maximum": 6}]})
    assert is_valid("x", {"not": {"type": "integer"}})
    assert not is_valid(3, {"not": {"type": "integer"}})


def test_ref_resolution_and_recursion():
    schema = {
        "type": "object",
        "properties": {"child": {"$ref": "#"}, "v": {"type": "integer"}},
    }
    assert is_valid({"v": 1, "child": {"v": 2}}, schema)
    assert not is_valid({"v": 1, "child": {"v": "s"}}, schema)
    defs = {
        "definitions": {"pos": {"type": "integer", "minimum": 0}},
        "properties": {"n": {"$ref": "#/definitions/pos"}},
    }
    assert is_valid({"n": 3}, defs)
    assert not is_valid({"n": -1}, defs)
    with pytest.raises(SchemaError):
        validate_value(1, {"$ref": "#/nope"})


def test_formats():
    assert is_valid("2024-01-30T10:00:00Z", {"format": "date-time"})
    assert not is_valid("not a date", {"format": "date-time"})
    assert is_valid("1.2.3.4", {"format": "ip-address"})
    assert not is_valid("1.2.3.999", {"format": "ip-address"})
    assert is_valid("::1", {"format": "ipv6"})
    assert not is_valid("zz::1::2", {"format": "ipv6"})
    assert is_valid("a@b.co", {"format": "email"})
    assert is_valid("https://x.org/y", {"format": "uri"})
    assert is_valid("[a-z]+", {"format": "regex"})
    assert not is_valid("[", {"format": "regex"})
    assert is_valid("anything", {"format": "unknown-format"})  # unknown passes


def test_min_max_properties():
    assert not is_valid({}, {"minProperties": 1})
    assert not is_valid({"a": 1, "b": 2}, {"maxProperties": 1})
    assert is_valid({"a": 1}, {"minProperties": 1, "maxProperties": 1})


def test_error_ordering_and_paths():
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "integer"},
            "b": {"type": "string", "required": True},
        },
    }
    errs = validate_value({"a": "x"}, schema)
    assert ("a", "type") in errs and ("b", "required") in errs


class TestExternalRefRegistry:
    """A16 external $ref: offline registry-based resolution."""

    def setup_method(self):
        from vald import jsonschema as js

        js.register_schema(
            "https://example.test/address.json",
            {
                "type": "object",
                "properties": {
                    "city": {"type": "string", "required": True},
                    "zip": {"$ref": "#/definitions/zip"},
                },
                "definitions": {"zip": {"type": "string", "pattern": "^[0-9]{5}$"}},
            },
        )

    def teardown_method(self):
        from vald import jsonschema as js

        js.unregister_schema("https://example.test/address.json")

    def test_external_ref_resolves(self):
        from vald import jsonschema as js

        schema = {
            "type": "object",
            "properties": {"addr": {"$ref": "https://example.test/address.json"}},
        }
        assert js.is_valid({"addr": {"city": "Springfield", "zip": "12345"}}, schema)
        assert not js.is_valid({"addr": {"zip": "12345"}}, schema)  # city required

    def test_intra_doc_ref_inside_external_doc_uses_its_root(self):
        from vald import jsonschema as js

        # the nested '#/definitions/zip' must resolve within address.json
        schema = {"$ref": "https://example.test/address.json"}
        assert not js.is_valid({"city": "x", "zip": "abcde"}, schema)
        assert js.is_valid({"city": "x", "zip": "99999"}, schema)

    def test_external_fragment(self):
        from vald import jsonschema as js

        schema = {"$ref": "https://example.test/address.json#/definitions/zip"}
        assert js.is_valid("12345", schema)
        assert not js.is_valid("12a45", schema)

    def test_unregistered_external_ref_raises(self):
        import pytest

        from vald import jsonschema as js

        with pytest.raises(js.SchemaError, match="not registered"):
            js.is_valid({}, {"$ref": "https://nowhere.test/x.json"})

    def test_kernel_registry_param(self):
        import numpy as np
        import pyarrow as pa

        from vald.kernels import eval_kernel

        col = pa.array(['{"zip": "12345"}', '{"zip": "xx"}', None])
        ok = eval_kernel(
            "jsonSchema",
            col,
            {
                "schema": {
                    "type": "object",
                    "properties": {"zip": {"$ref": "https://example.test/zipdoc.json"}},
                },
                "registry": {
                    "https://example.test/zipdoc.json": {
                        "type": "string",
                        "pattern": "^[0-9]{5}$",
                    }
                },
            },
        )
        assert ok.tolist() == [True, False, True]
