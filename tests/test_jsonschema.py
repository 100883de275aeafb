"""JSON Schema draft-2020-12 subset validator: keyword semantics,
spec quirks (integer accepts 1.0, bool is not number), pointers."""

import pytest

from shared_etl_pipelines_spark.sources.jsonschema import (
    validate,
    validate_record,
)


def test_type_semantics_spec_quirks():
    assert validate(1.0, {"type": "integer"}) == []     # zero-fraction float
    assert validate(1.5, {"type": "integer"}) == [("/", "type")]
    assert validate(True, {"type": "number"}) == [("/", "type")]  # bool trap
    assert validate(True, {"type": "boolean"}) == []
    assert validate(None, {"type": "null"}) == []
    assert validate("x", {"type": ["number", "string"]}) == []


def test_object_and_array_keywords():
    schema = {
        "type": "object",
        "required": ["a"],
        "additionalProperties": False,
        "properties": {
            "a": {"type": "integer", "minimum": 0, "exclusiveMaximum": 10},
            "b": {"type": "array", "items": {"type": "string"},
                  "minItems": 1, "maxItems": 2},
        },
    }
    assert validate({"a": 3, "b": ["x"]}, schema) == []
    assert validate({"b": []}, schema) == [
        ("/a", "required"), ("/b", "minItems"),
    ]
    assert validate({"a": 10}, schema) == [("/a", "exclusiveMaximum")]
    assert validate({"a": 1, "z": 0}, schema) == [
        ("/z", "additionalProperties")
    ]
    assert validate({"a": 1, "b": ["x", 2]}, schema) == [("/b/1", "type")]


def test_enum_const_strings():
    assert validate("b", {"enum": ["a", "b"]}) == []
    assert validate("c", {"enum": ["a", "b"]}) == [("/", "enum")]
    assert validate(5, {"const": 5}) == []
    assert validate("abc", {"type": "string", "maxLength": 2}) == [
        ("/", "maxLength")
    ]
    # unknown keywords are annotations per spec: ignored, not errors
    assert validate("x", {"type": "string", "format": "email"}) == []


def test_boolean_schemas_and_malformed():
    assert validate(42, True) == []
    assert validate(42, {}) == []
    assert validate(42, False) == [("/", "false-schema")]
    with pytest.raises(ValueError, match="unknown type"):
        validate(1, {"type": "float"})
    with pytest.raises(ValueError, match="schema node"):
        validate(1, [1, 2])


def test_validate_record_verdicts():
    schema = {"type": "object", "required": ["id"],
              "properties": {"id": {"type": "integer"}}}
    assert validate_record(b'{"id": 1}', schema)["verdict"] == "ok"
    v = validate_record(b'{"id": "x"}', schema)
    assert (v["verdict"], v["first_path"]) == ("type", "/id")
    assert validate_record(b'{"id": 1', schema)["verdict"] == "parse"
    assert validate_record(b"\xff\xfe", schema)["verdict"] == "parse"


def test_enum_const_bool_is_not_number():
    """JSON Schema types bool and number are disjoint for literals too:
    True==1 in Python must not leak into enum/const (ADVICE r10)."""
    from shared_etl_pipelines_spark.sources.jsonschema import validate

    assert validate(True, {"enum": [1]}) == [("/", "enum")]
    assert validate(False, {"const": 0}) == [("/", "const")]
    assert validate(1, {"enum": [True]}) == [("/", "enum")]
    assert validate(0, {"const": False}) == [("/", "const")]
    # the honest matches still pass
    assert validate(True, {"enum": [True]}) == []
    assert validate(1, {"const": 1}) == []
