"""Draft model/schema_spec.py from the reference's committed JSON Schema.

Reads /root/reference/docs/DoclingDocument.json (the PUBLIC schema contract
of the document model) and inverse-compresses every property into the
compact spec notation that model/schema.py re-expands.  Anything that
does not fit a convention is emitted as a raw dict, so the round trip is
exact by construction *only if* the emitter's conventions are right — the
GT test does the actual equality check.

Run: python scripts/draft_schema_spec.py > docling_core_spark/model/schema_spec.py
"""

from __future__ import annotations

import json
from typing import Any

GT = "/root/reference/docs/DoclingDocument.json"

_PRIMS = {"string", "number", "integer", "boolean", "null", "object"}

# AnyUrl / Path expansions pydantic uses for hyperlink-ish unions
_ANYURL = {"format": "uri", "minLength": 1, "type": "string"}
_PATH = {"format": "path", "type": "string"}


def title_of(field: str) -> str:
    return " ".join(w.title() if w else w for w in field.split("_"))


def compress_member(p: dict) -> Any:
    """Compress a nested (title-less) schema node."""
    if p == _ANYURL:
        return "'anyurl'"
    if p == _PATH:
        return "'pathstr'"
    if set(p) == {"oneOf", "discriminator"} and p["discriminator"].get("propertyName") == "kind":
        names = [m["$ref"].rsplit("/", 1)[1] for m in p["oneOf"]]
        # the mapping must be derivable from the member defs' `kind` consts;
        # the emitter recomputes it (checked by the GT test)
        mapped = set(p["discriminator"]["mapping"].values())
        assert mapped == {f"#/$defs/{n}" for n in names}, p
        inner = ", ".join(f"'{n}'" for n in names)
        return f"dunion({inner})"
    if set(p) == {"$ref"}:
        return f"'@{p['$ref'].rsplit('/', 1)[1]}'"
    if set(p) == {"type"} and p["type"] in _PRIMS:
        return f"'{p['type']}'"
    if "anyOf" in p:
        extras = {k: v for k, v in p.items() if k != "anyOf"}
        members = p["anyOf"]
        if members and members[-1] == {"type": "null"} and len(members) >= 2:
            inner = [compress_member(m) for m in members[:-1]]
            body = inner[0] if len(inner) == 1 else f"U({', '.join(inner)})"
            return _wrap(f"opt({body}", extras, close=")")
        inner = [compress_member(m) for m in members]
        return _wrap(f"U({', '.join(inner)}", extras, close=")")
    if p.get("type") == "array" and "prefixItems" in p:
        extras = {
            k: v
            for k, v in p.items()
            if k not in ("type", "prefixItems", "minItems", "maxItems")
        }
        assert p.get("minItems") == p.get("maxItems") == len(p["prefixItems"])
        inner = ", ".join(compress_member(m) for m in p["prefixItems"])
        return _wrap(f"tup({inner}", extras, close=")")
    if p.get("type") == "array" and "items" in p:
        extras = {k: v for k, v in p.items() if k not in ("type", "items")}
        return _wrap(f"arr({compress_member(p['items'])}", extras, close=")")
    if p.get("type") == "object" and isinstance(p.get("additionalProperties"), dict):
        extras = {k: v for k, v in p.items() if k not in ("type", "additionalProperties")}
        return _wrap(f"mapof({compress_member(p['additionalProperties'])}", extras, close=")")
    if p.get("type") in _PRIMS:
        extras = {k: v for k, v in p.items() if k != "type"}
        return _wrap(f"t('{p['type']}'", extras, close=")")
    return f"raw({p!r})"


def _wrap(prefix: str, extras: dict, close: str) -> str:
    if not extras:
        return prefix + close
    kw = ", ".join(f"{_safe_kw(k)}={v!r}" for k, v in extras.items())
    return f"{prefix}, {kw}{close}"


_KW_MAP = {
    "default": "default",
    "description": "desc",
    "examples": "examples",
    "pattern": "pattern",
    "minimum": "minimum",
    "maximum": "maximum",
    "minItems": "min_items",
    "uniqueItems": "unique_items",
    "minLength": "min_length",
    "deprecated": "deprecated",
    "additionalProperties": "additional",
    "const": "const",
    "enum": "enum",
    "title": "title",  # only when NOT reconstructible
    "format": "format",
}


def _safe_kw(k: str) -> str:
    return _KW_MAP[k]


def compress_field(fname: str, p: dict) -> str:
    p = dict(p)
    # drop a reconstructible title (the emitter re-adds it per the
    # ref-omission rule)
    has_ref_top = "$ref" in p or any("$ref" in m for m in p.get("anyOf", []))
    if "title" in p:
        assert not has_ref_top, (fname, p)
        if p["title"] == title_of(fname):
            p.pop("title")
    else:
        assert has_ref_top or "anyOf" in p, (fname, p)
    # const implies title+type+default in pydantic output
    if "const" in p:
        extras = {k: v for k, v in p.items() if k not in ("const", "type", "default")}
        assert p.get("type") == "string" and p.get("default") == p["const"], (fname, p)
        return _wrap(f"const({p['const']!r}", extras, close=")")
    if "enum" in p and p.get("type") == "string" and "anyOf" not in p:
        extras = {k: v for k, v in p.items() if k not in ("enum", "type")}
        return _wrap(f"enum({p['enum']!r}", extras, close=")")
    if set(p) - {"default", "description", "deprecated"} == {"$ref"}:
        extras = {k: v for k, v in p.items() if k != "$ref"}
        return _wrap(f"ref('{p['$ref'].rsplit('/', 1)[1]}'", extras, close=")")
    return compress_member(p)


def main() -> None:
    gt = json.load(open(GT))
    lines = [
        '"""Declared shape of the document model (JSON-Schema spec table).',
        "",
        "Compact field specs expanded by model/schema.py into the pydantic-style",
        "JSON Schema that the reference commits as docs/DoclingDocument.json (the",
        "public schema contract; GT-compared by tests/test_jsonschema_gt.py).",
        "Drafted by scripts/draft_schema_spec.py, then maintained by hand.",
        '"""',
        "",
        "from docling_core_spark.model.schema_dsl import (",
        "    U, arr, const, dunion, enum, mapof, opt, raw, ref, t, tup,",
        ")",
        "",
        "",
    ]

    def emit_def(name: str, dd: dict, var: str) -> None:
        lines.append(f"{var} = {{")
        lines.append(f"    'title': {dd.get('title')!r},")
        if "description" in dd:
            lines.append(f"    'description': {dd['description']!r},")
        if "additionalProperties" in dd:
            lines.append(f"    'additional': {dd['additionalProperties']!r},")
        if "required" in dd:
            lines.append(f"    'required': {dd['required']!r},")
        if "enum" in dd:  # enum-only def (no properties)
            lines.append(f"    'enum': {dd['enum']!r},")
            if "type" in dd:
                lines.append(f"    'type': {dd['type']!r},")
        if "properties" in dd:
            lines.append("    'fields': {")
            for fname, p in dd["properties"].items():
                lines.append(f"        {fname!r}: {compress_field(fname, p)},")
            lines.append("    },")
        leftover = set(dd) - {
            "title", "description", "additionalProperties", "required",
            "properties", "type", "enum",
        }
        assert not leftover or leftover == {"type"}, (name, leftover)
        lines.append("}")
        lines.append("")

    lines.append("DEFS = {}")
    lines.append("")
    for name, dd in gt["$defs"].items():
        var = f"_{name}"
        emit_def(name, dd, var)
        lines.append(f"DEFS[{name!r}] = {var}")
        lines.append("")
    emit_def("DoclingDocument", {k: v for k, v in gt.items() if k != "$defs"}, "ROOT")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
