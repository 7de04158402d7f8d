"""Compact spec notation for the document model's JSON Schema.

model/schema_spec.py declares every model class with these helpers;
model/schema.py expands them into pydantic-style JSON Schema (the emission
conventions — title casing, anyOf-null optionals, ref-title omission,
discriminated unions — live in the expander, not the table).

Spec forms:
- ``'string' | 'number' | 'integer' | 'boolean' | 'object' | 'null'``
- ``'@Name'`` — bare ``$ref`` to another def
- ``'anyurl' | 'pathstr'`` — pydantic's AnyUrl / Path string schemas
- helper calls below, each returning a small AST node dict
"""

from __future__ import annotations

from typing import Any

# keyword-argument -> JSON Schema key
KW_TO_JSON = {
    "desc": "description",
    "default": "default",
    "examples": "examples",
    "pattern": "pattern",
    "minimum": "minimum",
    "maximum": "maximum",
    "min_items": "minItems",
    "unique_items": "uniqueItems",
    "min_length": "minLength",
    "deprecated": "deprecated",
    "additional": "additionalProperties",
    "title": "title",
    "format": "format",
}


def _node(kind: str, args: tuple, extras: dict) -> dict:
    for k in extras:
        if k not in KW_TO_JSON:
            raise ValueError(f"unknown spec keyword: {k}")
    return {"__kind__": kind, "args": args, "extras": extras}


def t(prim: str, **extras: Any) -> dict:
    """Primitive type with extra constraints (pattern, bounds, ...)."""
    return _node("prim", (prim,), extras)


def opt(inner: Any, **extras: Any) -> dict:
    """``Optional[inner]`` — anyOf [inner, null]."""
    return _node("opt", (inner,), extras)


def U(*members: Any, **extras: Any) -> dict:
    """Plain union — anyOf of the members."""
    return _node("union", members, extras)


def arr(item: Any, **extras: Any) -> dict:
    """``list[item]``."""
    return _node("arr", (item,), extras)


def tup(*items: Any, **extras: Any) -> dict:
    """Fixed-length tuple — prefixItems with min=max=len."""
    return _node("tup", items, extras)


def mapof(value: Any, **extras: Any) -> dict:
    """``dict[str, value]`` — additionalProperties schema."""
    return _node("map", (value,), extras)


def const(value: str, **extras: Any) -> dict:
    """Literal string field (pydantic: const + default + type string)."""
    return _node("const", (value,), extras)


def enum(values: list, **extras: Any) -> dict:
    """Inline string enum."""
    return _node("enum", (values,), extras)


def ref(name: str, **extras: Any) -> dict:
    """``$ref`` with extras (default/deprecated/description)."""
    return _node("ref", (name,), extras)


def dunion(*names: str) -> dict:
    """Discriminated union on the members' ``kind`` const field."""
    return _node("dunion", names, {})


def raw(schema: dict) -> dict:
    """Verbatim schema escape hatch."""
    return _node("raw", (schema,), {})
