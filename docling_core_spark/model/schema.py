"""JSON-Schema emitter for the document model.

Expands the declarative spec table (model/schema_spec.py) into the same
JSON Schema the reference generates with pydantic's ``model_json_schema()``
and commits as ``docs/DoclingDocument.json`` (reference
utils/generate_jsonschema.py:1-54).  The pydantic emission conventions are
encoded here once:

- field titles are the snake_case name title-cased per word, and are OMITTED
  when the field schema is (or any union member is) a ``$ref``;
- ``Optional[X]`` becomes ``anyOf [X, null]``;
- literal string fields become ``const`` + ``default`` + ``type: string``;
- fixed tuples become ``prefixItems`` with ``minItems == maxItems``;
- discriminated unions emit ``oneOf`` plus a ``discriminator.mapping``
  recomputed from each member def's ``kind`` const.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from docling_core_spark.model.schema_dsl import KW_TO_JSON

_PRIMS = {"string", "number", "integer", "boolean", "object", "null"}
_ANYURL = {"format": "uri", "minLength": 1, "type": "string"}
_PATH = {"format": "path", "type": "string"}


def title_of(field: str) -> str:
    """Pydantic field title: snake_case split, each word title-cased."""
    return " ".join(w.title() if w else w for w in field.split("_"))


def _extras_json(extras: dict) -> dict:
    return {KW_TO_JSON[k]: v for k, v in extras.items()}


class SchemaEmitter:
    def __init__(self, defs: dict):
        self.defs = defs

    # -- spec expansion ----------------------------------------------------

    def expand(self, spec: Any) -> dict:
        """Expand a spec into a title-less schema node."""
        if isinstance(spec, str):
            if spec in _PRIMS:
                return {"type": spec}
            if spec == "anyurl":
                return dict(_ANYURL)
            if spec == "pathstr":
                return dict(_PATH)
            if spec.startswith("@"):
                return {"$ref": f"#/$defs/{spec[1:]}"}
            raise ValueError(f"unknown spec atom: {spec!r}")
        kind = spec["__kind__"]
        args, extras = spec["args"], _extras_json(spec["extras"])
        if kind == "prim":
            return {"type": args[0], **extras}
        if kind == "opt":
            return {"anyOf": self._members(args[0]) + [{"type": "null"}], **extras}
        if kind == "union":
            return {"anyOf": [self.expand(m) for m in args], **extras}
        if kind == "arr":
            return {"items": self.expand(args[0]), "type": "array", **extras}
        if kind == "tup":
            return {
                "maxItems": len(args),
                "minItems": len(args),
                "prefixItems": [self.expand(m) for m in args],
                "type": "array",
                **extras,
            }
        if kind == "map":
            return {
                "additionalProperties": self.expand(args[0]),
                "type": "object",
                **extras,
            }
        if kind == "const":
            return {"const": args[0], "default": args[0], "type": "string", **extras}
        if kind == "enum":
            return {"enum": list(args[0]), "type": "string", **extras}
        if kind == "ref":
            return {"$ref": f"#/$defs/{args[0]}", **extras}
        if kind == "dunion":
            return {
                "discriminator": {
                    "mapping": {
                        self._kind_const(n): f"#/$defs/{n}" for n in args
                    },
                    "propertyName": "kind",
                },
                "oneOf": [{"$ref": f"#/$defs/{n}"} for n in args],
            }
        if kind == "raw":
            return json.loads(json.dumps(args[0]))  # deep copy
        raise ValueError(f"unknown spec kind: {kind}")

    def _members(self, inner: Any) -> list:
        """Union members of an opt() payload (a nested U flattens)."""
        if isinstance(inner, dict) and inner.get("__kind__") == "union":
            return [self.expand(m) for m in inner["args"]]
        return [self.expand(inner)]

    def _kind_const(self, def_name: str) -> str:
        spec = self.defs[def_name]["fields"]["kind"]
        assert spec["__kind__"] == "const", def_name
        return spec["args"][0]

    # -- field / def / document assembly ----------------------------------

    def expand_field(self, fname: str, spec: Any) -> dict:
        out = self.expand(spec)
        # pydantic omits the title when the schema is a $ref or any union
        # member is one
        has_ref = "$ref" in out or any(
            "$ref" in m for m in out.get("anyOf", [])
        ) or "oneOf" in out
        if not has_ref and "title" not in out:
            out["title"] = title_of(fname)
        return out

    def expand_def(self, dd: dict) -> dict:
        out: dict = {}
        if "additional" in dd:
            out["additionalProperties"] = dd["additional"]
        if "description" in dd:
            out["description"] = dd["description"]
        if "enum" in dd:
            out["enum"] = dd["enum"]
        if "fields" in dd:
            out["properties"] = {
                fname: self.expand_field(fname, spec)
                for fname, spec in dd["fields"].items()
            }
        if "required" in dd:
            out["required"] = dd["required"]
        out["title"] = dd["title"]
        out["type"] = dd.get("type", "object")
        return out


def document_json_schema() -> dict:
    """The DoclingDocument JSON Schema from the declared model shape
    (equivalent of the reference's committed docs/DoclingDocument.json)."""
    from docling_core_spark.model.schema_spec import DEFS, ROOT

    em = SchemaEmitter(DEFS)
    out = {"$defs": {name: em.expand_def(dd) for name, dd in DEFS.items()}}
    out.update(em.expand_def(ROOT))
    return out


def generate_json_schema(class_reference: str) -> Optional[dict]:
    """Schema for one declared model class by name (reference
    utils/generate_jsonschema.py:26-40 — dotted pydantic paths map to the
    class name's final component here); None for unknown classes."""
    from docling_core_spark.model.schema_spec import DEFS

    name = class_reference.rsplit(".", 1)[-1]
    if name == "DoclingDocument":
        return document_json_schema()
    if name not in DEFS:
        return None
    em = SchemaEmitter(DEFS)
    out = em.expand_def(DEFS[name])
    # sub-schemas carry the $defs they reference (pydantic does the same);
    # compute the transitive closure of refs
    needed: set[str] = set()

    def walk(node: Any) -> None:
        if isinstance(node, dict):
            r = node.get("$ref")
            if isinstance(r, str) and r.startswith("#/$defs/"):
                tgt = r.rsplit("/", 1)[1]
                if tgt not in needed:
                    needed.add(tgt)
                    walk(em.expand_def(DEFS[tgt]))
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(out)
    if needed:
        out = {"$defs": {n: em.expand_def(DEFS[n]) for n in sorted(needed)}, **out}
    return out
