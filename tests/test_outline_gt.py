"""Byte/structure parity of the outline serializer vs reference GT fixtures
(reference test/test_serialization_outline.py)."""

from __future__ import annotations

import json

import pytest

from docling_core_spark.functions.outline_out import (
    export_to_outline,
    format_indented_line,
)
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt

FLAT = "doc/2408.09869v5_enriched_summary"
HIER = "doc/2408.09869v5_hierarchical_enriched_summary"


def _doc(base: str) -> Doc:
    return Doc.from_dict(load_doc_json(f"{base}.json"))


@pytest.mark.parametrize(
    "base,mode,fmt,non_meta,gt",
    [
        (FLAT, "table_of_contents", "markdown", True, f"{FLAT}.toc.gt.md"),
        (HIER, "table_of_contents", "markdown", True, f"{HIER}.toc.gt.md"),
        (FLAT, "outline", "markdown", True, f"{FLAT}.outline.gt.md"),
        (FLAT, "table_of_contents", "markdown", False, f"{FLAT}.mtoc.gt.md"),
        (FLAT, "table_of_contents", "itxt", True, f"{FLAT}.mtoc.gt.itxt"),
        (HIER, "table_of_contents", "itxt", True, f"{HIER}.toc.gt.itxt"),
    ],
)
def test_outline_text_formats(base, mode, fmt, non_meta, gt):
    out = export_to_outline(_doc(base), mode=mode, format=fmt, include_non_meta=non_meta)
    assert out == load_gt(gt).rstrip()


@pytest.mark.parametrize(
    "base,mode,gt",
    [
        (FLAT, "table_of_contents", f"{FLAT}.mtoc.gt.json"),
        (HIER, "table_of_contents", f"{HIER}.mtoc.gt.json"),
        (FLAT, "outline", f"{FLAT}.outline.gt.json"),
    ],
)
def test_outline_json_formats(base, mode, gt):
    out = export_to_outline(_doc(base), mode=mode, format="json")
    assert json.loads(out) == json.loads(load_gt(gt))


def test_outline_custom_meta_field_passthrough():
    data = json.loads(export_to_outline(_doc(HIER), mode="table_of_contents", format="json"))
    assert data[0]["ref"] == "#/body"
    assert data[0]["mellea__original_char_count"] == 382


def test_outline_start_item_and_max_level():
    doc = _doc(HIER)
    nested = doc.resolve("#/texts/25")

    data = json.loads(
        export_to_outline(
            doc, mode="table_of_contents", format="json", start_item=nested
        )
    )
    assert len(data) == 8, "1 parent + 7 children expected"
    assert data[0]["ref"] == "#/texts/25" and data[0]["level"] == 2
    assert all(d["level"] == 3 for d in data[1:])

    combined = json.loads(
        export_to_outline(
            doc, mode="table_of_contents", format="json", start_item=nested, max_level=2
        )
    )
    assert len(combined) == 1 and combined[0]["ref"] == "#/texts/25"

    md = export_to_outline(doc, mode="table_of_contents", format="markdown", max_level=2)
    assert "# 2408.09869v5\n\\[ref=#/body\\]" in md
    assert "### 4 Performance\n\\[ref=#/texts/66\\]" in md
    assert "#### OCR\n\\[ref=#/texts/58\\]" not in md

    md_start = export_to_outline(
        doc, mode="table_of_contents", format="markdown", start_item=nested
    )
    assert md_start.startswith("### 3 Processing pipeline\n\\[ref=#/texts/25\\]")
    assert "\\[ref=#/body\\]" not in md_start and "\\[ref=#/texts/66\\]" not in md_start

    itxt_start = export_to_outline(
        doc, mode="table_of_contents", format="itxt", start_item=nested
    )
    first = itxt_start.split("\n")[0]
    assert first.startswith("[ref=#/texts/25]") and not first.startswith(" ")


def test_format_indented_line():
    item = {
        "ref": "#/texts/0",
        "item": "section_header",
        "title": "Introduction",
        "summary": "This is a short summary.",
        "level": 1,
    }
    assert (
        format_indented_line(item, indent_size=2, max_summary_length=100)
        == "  [ref=#/texts/0] [Introduction] This is a short summary."
    )
    long = dict(item, summary="A" * 150, level=2)
    line = format_indented_line(long, indent_size=2, max_summary_length=50)
    assert line.endswith("...") and len(line.split("] ")[-1]) == 50
    no_title = {"ref": "#/texts/2", "item": "paragraph", "summary": "S", "level": 0}
    assert format_indented_line(no_title) == "[ref=#/texts/2] S"
