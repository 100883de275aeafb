"""JSON Schema validation (PUBLIC json-schema.org draft 2020-12 subset).

The data-contract gate for JSONL intake: a producer publishes a
schema, the pipeline validates every record BEFORE it enters the
corpus and routes violations to quarantine with a named keyword —
the declarative sibling of operators/quality.check_expectations.

Implemented keywords (the subset real ingestion contracts use):
``type`` (string/number/integer/boolean/object/array/null, or a list
of those), ``required``, ``properties``, ``additionalProperties``
(boolean form), ``enum``, ``const``, ``minimum`` / ``maximum`` /
``exclusiveMinimum`` / ``exclusiveMaximum``, ``minLength`` /
``maxLength``, ``minItems`` / ``maxItems``, ``items`` (single-schema
form). Per the spec: unknown keywords are annotations and are
IGNORED; ``integer`` accepts any number with zero fractional part
(1.0 validates); booleans are NOT numbers (Python's bool-is-int trap
handled explicitly).

``validate`` returns the violation list — (json-pointer path,
keyword) pairs — empty means valid. Malformed schema shapes raise
ValueError up front (a broken contract must not half-validate)."""

from __future__ import annotations

import json

__all__ = ["validate", "validate_record"]

_TYPES = {
    "string": str,
    "boolean": bool,
    "object": dict,
    "array": list,
    "null": type(None),
}


def _is_type(v, t: str) -> bool:
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "integer":
        return (
            isinstance(v, (int, float))
            and not isinstance(v, bool)
            and float(v) == int(v)
        )
    if t == "boolean":
        return isinstance(v, bool)
    py = _TYPES.get(t)
    if py is None:
        raise ValueError(f"jsonschema: unknown type {t!r} in schema")
    if py is str:
        return isinstance(v, str)
    return isinstance(v, py) and not isinstance(v, bool)


def validate(value, schema: dict, path: str = "") -> list[tuple[str, str]]:
    """Violations as (json-pointer, keyword); empty list == valid."""
    if schema is True or schema == {}:
        return []
    if schema is False:
        return [(path or "/", "false-schema")]
    if not isinstance(schema, dict):
        raise ValueError("jsonschema: schema node must be object/bool")
    out: list[tuple[str, str]] = []

    t = schema.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        if not any(_is_type(value, x) for x in types):
            out.append((path or "/", "type"))
            return out  # further keyword checks presume the type

    # Python equality says True == 1 / False == 0; JSON Schema does not
    # (bool is its own type). Literal comparison must be type-aware or
    # {"enum": [1]} would accept true — the same bool-is-not-number rule
    # the type/minimum checks already apply.
    def _same_literal(a, b):
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        return a == b

    if "enum" in schema and not any(
        _same_literal(value, c) for c in schema["enum"]
    ):
        out.append((path or "/", "enum"))
    if "const" in schema and not _same_literal(value, schema["const"]):
        out.append((path or "/", "const"))

    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            out.append((path or "/", "minimum"))
        if "maximum" in schema and value > schema["maximum"]:
            out.append((path or "/", "maximum"))
        if "exclusiveMinimum" in schema and value <= schema["exclusiveMinimum"]:
            out.append((path or "/", "exclusiveMinimum"))
        if "exclusiveMaximum" in schema and value >= schema["exclusiveMaximum"]:
            out.append((path or "/", "exclusiveMaximum"))

    if isinstance(value, str):
        if "minLength" in schema and len(value) < schema["minLength"]:
            out.append((path or "/", "minLength"))
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            out.append((path or "/", "maxLength"))

    if isinstance(value, dict):
        for req in schema.get("required", []):
            if req not in value:
                out.append((f"{path}/{req}", "required"))
        props = schema.get("properties", {})
        for k, sub in props.items():
            if k in value:
                out += validate(value[k], sub, f"{path}/{k}")
        if schema.get("additionalProperties") is False:
            for k in value:
                if k not in props:
                    out.append((f"{path}/{k}", "additionalProperties"))

    if isinstance(value, list):
        if "minItems" in schema and len(value) < schema["minItems"]:
            out.append((path or "/", "minItems"))
        if "maxItems" in schema and len(value) > schema["maxItems"]:
            out.append((path or "/", "maxItems"))
        items = schema.get("items")
        if items is not None:
            for i, item in enumerate(value):
                out += validate(item, items, f"{path}/{i}")

    return out


def validate_record(blob: bytes, schema: dict) -> dict:
    """One JSONL record -> verdict: {'verdict': 'ok'|keyword|'parse',
    'n_violations', 'first_path'}. The verdict is the FIRST violation's
    keyword (document order) — the quarantine bucket key."""
    try:
        value = json.loads(blob.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError):
        return {"verdict": "parse", "n_violations": 0, "first_path": ""}
    v = validate(value, schema)
    if not v:
        return {"verdict": "ok", "n_violations": 0, "first_path": ""}
    return {
        "verdict": v[0][1],
        "n_violations": len(v),
        "first_path": v[0][0],
    }
