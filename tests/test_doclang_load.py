"""DocLang deserializer: round-trip fixpoints and structural reconstruction
(reference test/test_deserializer_doclang.py patterns)."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.doclang_load import load_from_doclang
from docling_core_spark.functions.doclang_out import export_to_doclang
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json


def _fixpoint(doc: Doc, **params) -> tuple[str, Doc]:
    """serialize -> deserialize -> reserialize must be byte-stable."""
    s1 = export_to_doclang(doc, include_version=False, **params)
    doc2 = load_from_doclang(s1)
    s2 = export_to_doclang(doc2, include_version=False, **params)
    assert s1 == s2, "reserialization is not a fixpoint"
    return s1, doc2


def test_fixpoint_ddoc_0():
    doc = Doc.from_dict(load_doc_json("doc/ddoc_0.json"))
    _, loaded = _fixpoint(doc)
    assert len(loaded.tables) == len(doc.tables) == 7
    # same cell text in the same grid slots
    orig = doc.tables[0]["data"]["table_cells"]
    got = loaded.tables[0]["data"]["table_cells"]
    assert [(c["start_row_offset_idx"], c["start_col_offset_idx"], c["text"]) for c in got] == [
        (c["start_row_offset_idx"], c["start_col_offset_idx"], c["text"]) for c in orig
    ]
    assert [c.get("row_header", False) for c in got] == [c.get("row_header", False) for c in orig]


def test_fixpoint_activities_simplified():
    doc = Doc.from_dict(load_doc_json("doc/activities_simplified.yaml"))
    _, loaded = _fixpoint(doc, image_mode="placeholder")
    assert len(loaded.pictures) == 1
    meta = loaded.pictures[0].get("meta") or {}
    preds = (meta.get("classification") or {}).get("predictions") or []
    assert preds and preds[0]["class_name"] == "other"


def test_provenance_reconstruction_math():
    """location tokens quantize bbox/page; the loader rebuilds coords on a
    synthetic resolution-square page such that re-serialization is exact."""
    doc = Doc("t")
    doc.add_page(1, 200.0, 400.0)
    prov = [{
        "page_no": 1,
        "bbox": {"l": 50.0, "t": 380.0, "r": 150.0, "b": 300.0, "coord_origin": "BOTTOMLEFT"},
        "charspan": [0, 5],
    }]
    doc.add_text("text", "hello", prov=prov)
    s1, loaded = _fixpoint(doc)
    item = loaded.texts[0]
    assert item["prov"][0]["page_no"] == 1
    bb = item["prov"][0]["bbox"]
    # top-left origin, quantized to the 512 grid: l=50/200*512=128, t=(400-380)/400*512≈26
    assert bb["coord_origin"] == "TOPLEFT"
    assert bb["l"] == 128.0 and bb["t"] == 26.0
    assert item["prov"][0]["charspan"] == [0, 5]
    assert str(1) in loaded.pages or 1 in loaded.pages
    page = loaded.pages.get("1") or loaded.pages.get(1)
    assert page["size"] == {"width": 512, "height": 512}


def test_multi_provenance_text_threading():
    """A text item spanning two pages round-trips through <thread> fragments."""
    doc = Doc("t")
    doc.add_page(1, 100.0, 100.0)
    doc.add_page(2, 100.0, 100.0)
    item = doc.add_text("text", "first part second part")
    item["orig"] = "first part second part"
    item["prov"] = [
        {"page_no": 1, "bbox": {"l": 10, "t": 90, "r": 90, "b": 80, "coord_origin": "BOTTOMLEFT"},
         "charspan": [0, 10]},
        {"page_no": 2, "bbox": {"l": 10, "t": 90, "r": 90, "b": 80, "coord_origin": "BOTTOMLEFT"},
         "charspan": [11, 22]},
    ]
    s1 = export_to_doclang(doc, include_version=False)
    assert "<thread" in s1 and "<page_break" in s1
    loaded = load_from_doclang(s1)
    assert len(loaded.texts) == 1
    merged = loaded.texts[0]
    assert merged["text"] == "first partsecond part"  # fragment concat, per reference
    assert [p["page_no"] for p in merged["prov"]] == [1, 2]
    s2 = export_to_doclang(loaded, include_version=False)
    loaded2 = load_from_doclang(s2)
    assert loaded2.texts[0]["text"] == merged["text"]


def test_heading_levels_and_checkbox_labels():
    doc = Doc("t")
    doc.add_title("The Title")
    doc.add_heading("Sub", level=2)
    doc.add_text("checkbox_selected", "opt in")
    doc.add_text("checkbox_unselected", "opt out")
    doc.add_text("handwritten_text", "scribble")
    _, loaded = _fixpoint(doc)
    labels = [t["label"] for t in loaded.texts]
    assert labels == ["title", "section_header", "checkbox_selected",
                      "checkbox_unselected", "handwritten_text"]
    assert loaded.texts[1]["level"] == 2


def test_table_spans_reconstructed():
    doc = Doc("t")
    cells = [
        {"text": "span2", "start_row_offset_idx": 0, "end_row_offset_idx": 1,
         "start_col_offset_idx": 0, "end_col_offset_idx": 2, "col_span": 2, "column_header": True},
        {"text": "a", "start_row_offset_idx": 1, "end_row_offset_idx": 2,
         "start_col_offset_idx": 0, "end_col_offset_idx": 1},
        {"text": "b", "start_row_offset_idx": 1, "end_row_offset_idx": 2,
         "start_col_offset_idx": 1, "end_col_offset_idx": 2},
    ]
    doc.add_table({"num_rows": 2, "num_cols": 2, "table_cells": cells})
    _, loaded = _fixpoint(doc)
    got = loaded.tables[0]["data"]
    assert got["num_rows"] == 2 and got["num_cols"] == 2
    spanning = [c for c in got["table_cells"] if c["text"] == "span2"][0]
    assert spanning["col_span"] == 2 and spanning["column_header"]


def test_code_language_and_formula():
    doc = Doc("t")
    doc.add_code("print('hi')", code_language="Python")
    doc.add_formula("E=mc^2")
    _, loaded = _fixpoint(doc)
    assert loaded.texts[0]["label"] == "code"
    assert loaded.texts[0]["code_language"] == "Python"
    assert loaded.texts[1]["label"] == "formula"


def test_ordered_list_and_marker():
    doc = Doc("t")
    lg = doc.add_list_group()
    doc.add_list_item("first", parent=lg, enumerated=True, marker="1.")
    doc.add_list_item("second", parent=lg, enumerated=True, marker="2.")
    s1, loaded = _fixpoint(doc)
    assert 'class="ordered"' in s1
    items = [loaded.resolve(r["$ref"]) for r in loaded.groups[0]["children"]]
    assert [(i["text"], i["marker"], i["enumerated"]) for i in items] == [
        ("first", "1.", True), ("second", "2.", True)
    ]


def test_formatting_roundtrip():
    doc = Doc("t")
    doc.add_text("text", "important", formatting={"bold": True, "italic": True})
    _, loaded = _fixpoint(doc)
    fmt = loaded.texts[0].get("formatting") or {}
    assert fmt.get("bold") and fmt.get("italic")


def test_table_caption_roundtrip():
    doc = Doc("t")
    cap = doc.add_text("caption", "Table 1: stats")
    doc.add_table(
        {"num_rows": 1, "num_cols": 1, "table_cells": [
            {"text": "x", "start_row_offset_idx": 0, "end_row_offset_idx": 1,
             "start_col_offset_idx": 0, "end_col_offset_idx": 1}]},
        caption=cap,
    )
    _, loaded = _fixpoint(doc)
    tbl = loaded.tables[0]
    assert tbl["captions"], "caption ref missing"
    cap_item = loaded.resolve(tbl["captions"][0]["$ref"])
    assert cap_item["text"] == "Table 1: stats"


def test_cdata_content_roundtrip():
    doc = Doc("t")
    doc.add_text("text", 'a < b & "c"')
    doc.add_text("text", "  leading and trailing  ")
    _, loaded = _fixpoint(doc)
    assert loaded.texts[0]["text"] == 'a < b & "c"'
    assert loaded.texts[1]["text"] == "  leading and trailing  "
