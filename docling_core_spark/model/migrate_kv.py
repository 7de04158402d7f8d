"""Annotation-form key-value migration (reference document.py:381-765).

Converts the legacy single-KeyValueItem "annotation" form — a graph whose
cells point at existing document items via ``item_ref`` or provenance-bbox
matches — into field_regions/field_items in place, then cleans up form
groups: the cleanup replaces kv-associated FormItems with field regions,
wraps stray empty_value/checkbox runs in field_item/field_value shells, and
flattens remaining form_area groups.
"""

from __future__ import annotations

import copy
from typing import Any, Optional

from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc
from docling_core_spark.model.mutate import delete_items, insert_sibling, _move_subtree
from docling_core_spark.functions.geometry import iou

_ALL_LAYERS = set(M.CONTENT_LAYERS)
_ITER_ALL = dict(
    with_groups=True, traverse_pictures=True, included_content_layers=_ALL_LAYERS
)


def _cref(ref: Any) -> Optional[str]:
    if isinstance(ref, dict):
        return ref.get("$ref") or ref.get("cref")
    return ref


def _shift_up(doc: Doc, old_subroot: dict) -> None:
    """Splice a node's children into its parent in place of the node
    (reference document.py:1155; the orphan stays in its array until the
    post-migration normalize_references drops it)."""
    parent = doc.parent_of(old_subroot)
    if parent is None:
        raise ValueError("cannot shift up the root")
    kids = parent.setdefault("children", [])
    idx = next(i for i, r in enumerate(kids) if r["$ref"] == old_subroot["self_ref"])
    for i, child_ref in enumerate(old_subroot.get("children", [])):
        kids.insert(idx + i + 1, child_ref)
        doc.resolve(child_ref["$ref"])["parent"] = {"$ref": parent["self_ref"]}
    kids.remove({"$ref": old_subroot["self_ref"]})


def _shift_down(doc: Doc, old_subroot: dict, new_subroot: dict, array: str) -> dict:
    """Introduce new_subroot in old_subroot's place and move old under it
    (reference document.py:1179)."""
    insert_sibling(doc, new_subroot, array, old_subroot, after=False)
    _move_subtree(doc, old_subroot, new_subroot)
    return new_subroot


def _append_copy(doc: Doc, item: dict, array: str, parent: dict) -> dict:
    """Deep-copy an existing item as a fresh leaf child of parent
    (reference append_child_item with item.model_copy(deep=True))."""
    dup = copy.deepcopy(item)
    dup.pop("self_ref", None)
    dup.pop("parent", None)
    dup["children"] = []
    return doc._attach(array, dup, parent)


def _serialize_prov(prov: dict) -> str:
    bb = prov["bbox"]
    return (
        f"{prov['page_no']},{bb['l']},{bb['t']},{bb['r']},{bb['b']},"
        f"{bb.get('coord_origin', 'TOPLEFT')}"
    )


def _provs_match(p1: dict, p2: dict, iou_threshold: float = 0.01) -> bool:
    if p1["page_no"] != p2["page_no"] or p1["bbox"].get("coord_origin") != p2["bbox"].get(
        "coord_origin"
    ):
        return False
    return iou(p1["bbox"], p2["bbox"]) > iou_threshold


def _eq_prov(p1: dict, p2: dict) -> bool:
    """Provenance equality tolerating charspan discrepancies."""
    return p1["bbox"] == p2["bbox"] and p1["page_no"] == p2["page_no"]


def _kv_link_cells(graph: dict, link: dict) -> tuple[dict, dict]:
    """(key_cell, value_cell) for a link; non-to_value labels take the
    to_key orientation, as in the reference index builder."""
    cells = {c["cell_id"]: c for c in graph.get("cells", ())}
    if link.get("label") == "to_value":
        return cells[link["source_cell_id"]], cells[link["target_cell_id"]]
    return cells[link["target_cell_id"]], cells[link["source_cell_id"]]


def _build_prov_index(doc: Doc, kvi: dict) -> dict[str, dict]:
    graph = kvi.get("graph") or {}
    visited: set[str] = set()
    prov_index: dict[str, dict] = {}
    for link in graph.get("links", ()):
        if link.get("label") not in ("to_value", "to_key"):
            continue
        key_cell, value_cell = _kv_link_cells(graph, link)
        pair = f"{key_cell['cell_id']}-{value_cell['cell_id']}"
        if key_cell.get("prov") and value_cell.get("prov") and pair not in visited:
            visited.add(pair)
            for item, _ in doc.iterate_items(**_ITER_ALL):
                if M.is_doc_item(item) and item.get("prov"):
                    if _provs_match(item["prov"][0], key_cell["prov"]):
                        prov_index[_serialize_prov(key_cell["prov"])] = item
                    if _provs_match(item["prov"][0], value_cell["prov"]):
                        prov_index[_serialize_prov(value_cell["prov"])] = item
    return prov_index


class _MigrData:
    __slots__ = ("value_crefs", "key_cell", "value_cells")

    def __init__(self) -> None:
        self.value_crefs: list[str] = []
        self.key_cell: dict = {}
        self.value_cells: list[dict] = []


def _build_kv_migration_index(doc: Doc, kvi: dict) -> dict[str, dict[int, _MigrData]]:
    graph = kvi.get("graph") or {}
    outgoing: dict[str, dict[int, _MigrData]] = {}
    visited: set[str] = set()
    prov_index = _build_prov_index(doc, kvi)

    def item_ref_for(cell: dict) -> Optional[str]:
        if ref := _cref(cell.get("item_ref")):
            return ref
        if cell.get("prov"):
            node = prov_index.get(_serialize_prov(cell["prov"]))
            if node is not None:
                return node["self_ref"]
        return None

    for link in graph.get("links", ()):
        key_cell, value_cell = _kv_link_cells(graph, link)
        pair = f"{key_cell['cell_id']}-{value_cell['cell_id']}"
        if pair in visited:
            continue
        key_item_ref = item_ref_for(key_cell)
        val_item_ref = item_ref_for(value_cell)
        if key_item_ref and val_item_ref:
            visited.add(pair)
            migr_data = outgoing.setdefault(key_item_ref, {})
            entry = migr_data.setdefault(key_cell["cell_id"], _MigrData())
            entry.value_crefs.append(val_item_ref)
            entry.key_cell = key_cell
            entry.value_cells.append(value_cell)
    return outgoing


def _is_checkbox(label: Optional[str]) -> bool:
    return label in (M.CHECKBOX_SELECTED, M.CHECKBOX_UNSELECTED)


def migrate_annot_forms_to_field_regions(doc: Doc, kvi: dict) -> None:
    """The annotation-case migration (reference document.py:565-670)."""
    to_delete: list[dict] = [kvi]
    outgoing = _build_kv_migration_index(doc, kvi)

    for key_cref, key_cell_dict in outgoing.items():
        existing_key_item = doc.resolve(key_cref)
        ex = existing_key_item
        fri: dict = {"label": M.FIELD_REGION, "prov": []}
        ex_key_item_is_li = ex.get("label") == M.LIST_ITEM
        if ex_key_item_is_li:
            doc._attach("field_regions", fri, ex)
        else:
            _shift_down(doc, ex, fri, "field_regions")

        for _, migr in key_cell_dict.items():
            cell_eq = bool(
                migr.key_cell.get("prov")
                and M.is_doc_item(ex)
                and ex.get("prov")
                and _eq_prov(migr.key_cell["prov"], ex["prov"][0])
            )
            reuse_existing_key_item = len(key_cell_dict) == 1 and (
                migr.key_cell.get("prov") is None or cell_eq
            )
            key_prov = migr.key_cell.get("prov") or (
                ex["prov"][0] if ex.get("prov") else None
            )
            if reuse_existing_key_item:
                key_item = ex
            else:  # single key cref mapping to multiple key cells
                if M.is_text_item(ex):
                    ex["text"] = ""
                key_item = doc.add_text(  # temporary item
                    M.TEXT, migr.key_cell.get("text", ""), parent=ex,
                    prov=[key_prov] if key_prov else None,
                )
            skip_ki_deletion = any(key_item is d for d in to_delete)

            fi = doc.add_field_item(parent=fri)
            if M.is_text_item(key_item):
                doc.add_field_key(
                    migr.key_cell.get("text") or key_item.get("text", ""),
                    parent=fi, prov=[key_prov] if key_prov else None,
                )
                if key_item.get("label") == M.LIST_ITEM:
                    skip_ki_deletion = True
                    key_item["text"] = ""
                    if cell_eq:
                        key_item["prov"] = []
            elif M.is_picture_item(key_item):
                fk = doc.add_field_key(
                    migr.key_cell.get("text", ""), parent=fi,
                    prov=[key_prov] if key_prov else None,
                )
                if not key_item.get("children"):
                    _append_copy(doc, key_item, "pictures", fk)
                else:
                    skip_ki_deletion = True
            else:
                continue  # other key item types not handled (reference TODO)

            for idx, value_cref in enumerate(migr.value_crefs):
                value_item = doc.resolve(value_cref)
                value_prov = migr.value_cells[idx].get("prov") or (
                    value_item["prov"][0]
                    if M.is_doc_item(value_item) and value_item.get("prov")
                    else None
                )
                skip_vi_deletion = any(value_item is d for d in to_delete)
                if M.is_text_item(value_item):
                    value_text = migr.value_cells[idx].get("text") or value_item.get(
                        "text", ""
                    )
                    if _is_checkbox(value_item.get("label")):
                        if not value_item.get("children"):
                            fv = doc.add_field_value("", parent=fi)
                            dup = _append_copy(doc, value_item, "texts", fv)
                            dup["prov"] = [value_prov] if value_prov else []
                            dup["text"] = value_text
                        else:
                            skip_vi_deletion = True
                    else:
                        fv = doc.add_field_value(
                            value_text, parent=fi,
                            prov=[value_prov] if value_prov else None,
                        )
                        if value_item.get("label") == M.EMPTY_VALUE:
                            fv["kind"] = "fillable"
                    if value_item.get("label") == M.LIST_ITEM:
                        skip_vi_deletion = True
                elif M.is_picture_item(value_item):
                    fv = doc.add_field_value(
                        migr.value_cells[idx].get("text", ""), parent=fi,
                        prov=[value_prov] if value_prov else None,
                    )
                    if not value_item.get("children"):
                        _append_copy(doc, value_item, "pictures", fv)
                    else:
                        skip_vi_deletion = True
                else:
                    continue  # other value item types not handled

                if not skip_vi_deletion:
                    to_delete.append(value_item)
            if not skip_ki_deletion:
                to_delete.append(key_item)

            if ex.get("prov") and not cell_eq and not ex_key_item_is_li:
                fi["prov"] = ex["prov"]

    delete_items(doc, to_delete)


def _has_field_region_ancestor(doc: Doc, item: dict) -> bool:
    parent = doc.parent_of(item)
    while parent is not None:
        if M.ref_array(parent.get("self_ref", "")) == "field_regions":
            return True
        parent = doc.parent_of(parent)
    return False


def post_migration_cleanup(doc: Doc) -> None:
    """Replace kv-associated form items with field regions and wrap stray
    value runs (reference document.py:680-765)."""
    # 1. field regions nested under FormItems: lift them, swap the form for a
    #    field region shell
    to_shift_up: list[dict] = []
    to_replace_with_fri: list[dict] = []
    for fri in doc.field_regions:
        form_ancestor = None
        curr = fri
        while True:
            if M.ref_array(curr.get("self_ref", "")) == "form_items":
                form_ancestor = curr
                break
            parent = doc.parent_of(curr)
            if parent is None:
                break
            curr = parent
        if form_ancestor is not None:
            to_shift_up.append(fri)
            if not any(form_ancestor is f for f in to_replace_with_fri):
                to_replace_with_fri.append(form_ancestor)
    for form_item in to_replace_with_fri:
        shell: dict = {"label": M.FIELD_REGION, "prov": form_item.get("prov") or []}
        for passthrough in ("content_layer", "meta", "comments", "source"):
            if passthrough in form_item and form_item[passthrough] is not None:
                shell[passthrough] = form_item[passthrough]
        _shift_down(doc, form_item, shell, "field_regions")
        _shift_up(doc, form_item)
    for node in to_shift_up:
        _shift_up(doc, node)

    # 2. remaining value-only runs inside form areas
    value_groups: list[tuple[dict, list[dict]]] = []
    for outer, _ in doc.iterate_items(**_ITER_ALL):
        if outer.get("label") not in (M.GROUP_FORM_AREA, "form"):
            continue
        prev_is_value = False
        prev_level = -1
        for inner, level in doc.iterate_items(root=outer, **_ITER_ALL):
            parent = doc.parent_of(inner)
            if (
                M.is_text_item(inner)
                and inner.get("label")
                in (M.EMPTY_VALUE, M.CHECKBOX_SELECTED, M.CHECKBOX_UNSELECTED)
                and not (parent is not None and parent.get("label") == M.FIELD_VALUE)
            ):
                if prev_is_value and level == prev_level:
                    outer_prev, items = value_groups[-1]
                    value_groups[-1] = (outer_prev, items + [inner])
                else:
                    value_groups.append((outer, [inner]))
                prev_is_value = True
            else:
                prev_is_value = False
            prev_level = level

    already_shifted: list[dict] = []
    for outer, vg in value_groups:
        if not any(outer is s for s in already_shifted):
            already_shifted.append(outer)
            if not _has_field_region_ancestor(doc, outer):
                fri: dict = {"label": M.FIELD_REGION, "prov": []}
                if M.is_doc_item(outer):
                    fri["prov"] = outer.get("prov") or []
                _shift_down(doc, outer, fri, "field_regions")
            _shift_up(doc, outer)

        fi: dict = {"label": M.FIELD_ITEM, "prov": []}
        insert_sibling(doc, fi, "field_items", vg[0], after=False)
        for value_item in vg:
            fv: dict = {
                "label": M.FIELD_VALUE, "prov": [], "orig": "", "text": "",
                "kind": "read_only",
            }
            _shift_down(doc, value_item, fv, "texts")
            _move_subtree(doc, fv, fi)

    # 3. remaining form_area groups flatten away
    leftovers = [
        outer
        for outer, _ in doc.iterate_items(**_ITER_ALL)
        if M.is_group(outer) and outer.get("label") == M.GROUP_FORM_AREA
    ]
    for node in leftovers:
        _shift_up(doc, node)
