"""Document validation (T8; reference document.py:3205-3233, 5140, 5436-5492).

Used at pipeline boundaries (`--strict` runs, tests); the hot path skips
re-validation for speed, exactly like the reference does internally.
"""

from __future__ import annotations

from typing import Optional

from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc


def validate_tree(doc: Doc, root: Optional[dict] = None, raise_on_error: bool = False) -> bool:
    """Parent/child coherence + rich-table-cell wiring."""
    node = root if root is not None else doc.body
    for ref in node.get("children", ()):
        child = doc.resolve(ref["$ref"])
        parent_ref = (child.get("parent") or {}).get("$ref")
        if parent_ref != node["self_ref"] or not validate_tree(doc, child, raise_on_error):
            if raise_on_error:
                raise ValueError(
                    f"Document hierarchy is inconsistent. {node['self_ref']} has child "
                    f"{child['self_ref']} with parent {parent_ref}"
                )
            return False
    if M.is_table_item(node):
        child_crefs = {r["$ref"] for r in node.get("children", ())}
        for cell in (node.get("data") or {}).get("table_cells", ()):
            ref = cell.get("ref")
            if not ref:
                continue
            cref = ref["$ref"] if isinstance(ref, dict) else ref
            target = doc.resolve(cref)
            par = (target.get("parent") or {}).get("$ref")
            if par != node["self_ref"] or cref not in child_crefs:
                if raise_on_error:
                    raise ValueError(
                        f"Document hierarchy is inconsistent. {node['self_ref']} has cell "
                        f"{cref} with parent {par}"
                    )
                return False
    return True


def validate_unique_refs(doc: Doc, raise_on_error: bool = False) -> bool:
    """Every item's self_ref matches its array slot and is unique."""
    seen: set[str] = set()
    for arr in M._ALL_ARRAYS:  # every first-class item array, incl. field_*
        for i, item in enumerate(getattr(doc, arr)):
            expected = f"#/{arr}/{i}"
            if item.get("self_ref") != expected or expected in seen:
                if raise_on_error:
                    raise ValueError(f"ref mismatch at {expected}: {item.get('self_ref')}")
                return False
            seen.add(expected)
    return True


def validate_rules(doc: Doc, raise_on_error: bool = True) -> list[str]:
    """Furniture/list structural rules (reference _validate_rules)."""
    problems: list[str] = []

    def handle(msg: str) -> None:
        if raise_on_error:
            raise ValueError(msg)
        problems.append(msg)

    if doc.furniture.get("children"):
        handle(f"Deprecated furniture node {doc.furniture['self_ref']} has children")

    for item, _ in doc.iterate_items(
        with_groups=True, traverse_pictures=True, included_content_layers=M.CONTENT_LAYERS
    ):
        if M.is_list_group(item):
            for ref in item.get("children", ()):
                child = doc.resolve(ref["$ref"])
                if child.get("label") != M.LIST_ITEM:
                    handle(
                        f"ListGroup {item['self_ref']} contains non-ListItem {child['self_ref']}"
                    )
        elif M.is_group(item):
            if item.get("parent") and not item.get("children"):
                handle(f"Group {item['self_ref']} has no children")
        elif item.get("label") == M.LIST_ITEM:
            parent = doc.parent_of(item)
            if parent is None:
                handle(f"ListItem {item['self_ref']} has no parent")
            elif not M.is_list_group(parent):
                handle(
                    f"ListItem {item['self_ref']} has non-ListGroup parent: "
                    f"{(item.get('parent') or {}).get('$ref')}"
                )
    return problems


def validate_document(doc: Doc, strict: bool = False) -> dict:
    """Boundary validation report: {ok, tree_ok, refs_ok, rule_problems}."""
    tree_ok = validate_tree(doc, raise_on_error=strict)
    refs_ok = validate_unique_refs(doc, raise_on_error=strict)
    problems = validate_rules(doc, raise_on_error=False)
    if strict and problems:
        raise ValueError("; ".join(problems))
    return {
        "ok": tree_ok and refs_ok and not problems,
        "tree_ok": tree_ok,
        "refs_ok": refs_ok,
        "rule_problems": problems,
    }
