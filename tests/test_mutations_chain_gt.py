"""Insertion/deletion/range/bulk manipulation chain, byte-parity against the
15 constructed_doc.*.json.gt fixtures (reference test_docling_doc.py:1355-1700;
the starting document is the committed embedded dump, which equals the
builder fixture's export)."""

from __future__ import annotations

import json

import pytest

from docling_core_spark.model import tabledata as TD
from docling_core_spark.model.doc import Doc
from docling_core_spark.model.mutate import append_child, delete_items, insert_sibling, replace_item

from .conftest import load_doc_json


def _check(doc: Doc, name: str):
    expected = load_doc_json(f"doc/constructed_doc.{name}.json.gt")
    got = doc.to_dict()
    got["version"] = expected["version"]
    assert got == expected, f"mismatch vs constructed_doc.{name}.json.gt"


def _list_item(text: str) -> dict:
    # raw ListItem model default marker is "-" (items/text.py:146); only the
    # add_/insert_ builder paths default to ""
    return {"label": "list_item", "prov": [], "orig": text, "text": text,
            "enumerated": False, "marker": "-"}


def _text_item(text: str) -> dict:
    return {"label": "text", "prov": [], "orig": text, "text": text}


def test_manipulation_chain_gt():
    doc = Doc.from_dict(load_doc_json("doc/constructed_doc.embedded.json.gt"))

    node = doc.resolve("#/texts/10")
    insert_sibling(doc, _list_item("new list item (before)"), "texts", node, after=False)
    insert_sibling(doc, _list_item("new list item (after)"), "texts", node, after=True)
    _check(doc, "inserted_text")

    delete_items(doc, [doc.resolve("#/texts/10")])
    _check(doc, "deleted_text")

    delete_items(doc, [doc.resolve("#/groups/1")])
    _check(doc, "deleted_group")

    delete_items(doc, [doc.resolve("#/pictures/1")])
    _check(doc, "deleted_picture")

    text_item_3 = append_child(doc, _text_item("child text appended at body"), "texts")
    append_child(doc, _list_item("child text appended at body"), "texts",
                 parent=doc.resolve("#/groups/11"))

    with pytest.raises(ValueError):
        insert_sibling(doc, _text_item("foo"), "texts", doc.body, after=False)
    with pytest.raises(ValueError):
        append_child(doc, {**_text_item("foo"), "children": [{"$ref": "#/texts/0"}]}, "texts")
    _check(doc, "appended_child")

    replace_item(doc, text_item_3, _text_item("new child"), "texts")
    _check(doc, "replaced_item")

    node = doc.resolve("#/texts/45")
    last_node = doc.insert_list_group(node, name="Inserted List Group", after=True)
    group_node = doc.insert_inline_group(node, name="Inserted Inline Group", after=False)
    doc.insert_group(node, label="list", name="Inserted Group w/ LIST Label", after=True)
    doc.insert_group(node, label="ordered_list", name="Inserted Group w/ ORDERED_LIST Label", after=False)
    doc.insert_group(node, label="inline", name="Inserted Group w/ INLINE Label", after=True)
    doc.insert_group(node, label="unspecified", name="Inserted Group w/ UNSPECIFIED Label", after=False)
    doc.insert_text(node, "title", "Inserted Text w/ TITLE Label", after=True)
    doc.insert_text(node, "section_header", "Inserted Text w/ SECTION_HEADER Label", after=False)
    doc.insert_text(node, "code", "Inserted Text w/ CODE Label", after=True)
    doc.insert_text(node, "formula", "Inserted Text w/ FORMULA Label", after=False)
    doc.insert_text(node, "text", "Inserted Text w/ TEXT Label", after=True)

    table_data = {
        "table_cells": [
            {
                "start_row_offset_idx": i, "end_row_offset_idx": i + 1,
                "start_col_offset_idx": j, "end_col_offset_idx": j + 1,
                "text": str(i * 3 + j),
            }
            for i in range(3)
            for j in range(3)
        ],
        "num_rows": 3,
        "num_cols": 3,
    }
    doc.insert_table(node, data=table_data, after=False)

    # the reference builds this image with PIL (64x64 black PNG); the exact
    # ImageRef is taken from the committed fixture instead
    gt_items = load_doc_json("doc/constructed_doc.inserted_items.json.gt")
    image = next(
        p["image"] for p in gt_items["pictures"]
        if p.get("image", {}).get("size") == {"width": 64.0, "height": 64.0}
    )
    doc.insert_picture(node, image=json.loads(json.dumps(image)), after=True)

    doc.insert_title(node, "Inserted Title", after=False)
    doc.insert_code(node, "Inserted Code", after=True)
    doc.insert_formula(node, "Inserted Formula", after=False)
    doc.insert_heading(node, "Inserted Heading", after=True)

    graph = {
        "cells": [
            {"label": "key", "cell_id": 0, "text": "number", "orig": "#"},
            {"label": "value", "cell_id": 1, "text": "1", "orig": "1"},
        ],
        "links": [
            {"label": "to_value", "source_cell_id": 0, "target_cell_id": 1},
            {"label": "to_key", "source_cell_id": 1, "target_cell_id": 0},
        ],
    }
    doc.insert_key_values(node, graph=json.loads(json.dumps(graph)), after=False)
    doc.insert_form(node, graph=json.loads(json.dumps(graph)), after=True)
    _check(doc, "inserted_items")

    with pytest.warns(DeprecationWarning, match="ListItem parent must be a ListGroup"):
        li_sibling = doc.insert_list_item(node, "Inserted List Item, Incorrect Parent", after=False)
    doc.insert_list_item(li_sibling, "Inserted List Item, Correct Parent", after=True)
    doc.insert_text(li_sibling, "list_item",
                    "Inserted Text with LIST_ITEM Label, Correct Parent", after=False)
    with pytest.warns(DeprecationWarning, match="ListItem parent must be a ListGroup"):
        doc.insert_text(node, "list_item",
                        "Inserted Text with LIST_ITEM Label, Incorrect Parent", after=True)
    _check(doc, "inserted_list_items")

    doc.add_node_items(
        [_text_item("Bulk Addition 1"), _text_item("Bulk Addition 2")],
        doc=doc, parent=group_node,
    )
    _check(doc, "bulk_item_addition")

    doc.insert_node_items(
        node, [_text_item("Bulk Insertion 1"), _text_item("Bulk Insertion 2")],
        doc=doc, after=False,
    )
    _check(doc, "bulk_item_insertion")

    TD.add_row(table_data, ["*"] * 3)
    TD.add_rows(table_data, [["a", "b", "c"], ["d", "e", "f"]])
    TD.insert_row(table_data, 1, ["*"] * 3)
    TD.insert_rows(table_data, 1, [["a", "b", "c"], ["d", "e", "f"]], after=True)
    TD.pop_row(table_data, doc=doc)
    TD.remove_row(table_data, 3, doc=doc)
    TD.remove_rows(table_data, [1, 2, 5], doc=doc)
    with pytest.raises(IndexError):
        TD.remove_row(table_data, 100, doc=doc)
    _check(doc, "manipulated_table")

    with pytest.raises(ValueError):
        doc.extract_items_range(start=node, end=group_node)
    with pytest.raises(ValueError):
        doc.extract_items_range(start=li_sibling, end=node)

    extracted = doc.extract_items_range(start=group_node, end=node, end_inclusive=False, delete=True)
    _check(doc, "extracted_with_deletion")

    doc.add_document(doc=extracted, parent=last_node)
    _check(doc, "added_extracted_doc")

    doc.insert_document(doc=extracted, sibling=last_node, after=False)
    _check(doc, "inserted_extracted_doc")

    doc.delete_items_range(start=node, end=last_node, start_inclusive=False)
    _check(doc, "deleted_items_range")
