"""Sample-doc serializer GT targets not previously exercised
(reference test_plain_text_serialization.py:16, test_latex_serialization.py:
80-108, test_azure_serializer.py:99-149; the sample doc is the committed
embedded dump)."""

from __future__ import annotations

import json

import pytest

from docling_core_spark.functions.azure_out import export_to_azure
from docling_core_spark.functions.latex_out import export_to_latex
from docling_core_spark.functions.serializers import export_to_text
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt
from .test_doclang_fixture_sweep import _rich_table_doc


def _sample_doc() -> Doc:
    return Doc.from_dict(load_doc_json("doc/constructed_doc.embedded.json.gt"))


def test_plain_text_constructed():
    assert export_to_text(_sample_doc()).rstrip() == load_gt("doc/constructed.gt.txt").rstrip()


def test_latex_constructed():
    out = export_to_latex(_sample_doc(), image_mode="placeholder", page_break_command=None)
    assert out.rstrip() == load_gt("doc/construct_doc.gt.tex").rstrip()


def test_latex_rich_table_doc():
    out = export_to_latex(_rich_table_doc(), image_mode="placeholder", page_break_command=None)
    assert out.rstrip() == load_gt("doc/construct_rich_table_doc.gt.tex").rstrip()


def test_azure_constructed_minimal_prov():
    doc = _sample_doc()
    doc.add_page(1, 600.0, 800.0)

    def _ensure_prov(item, l, t, r, b):
        if not item.get("prov"):
            item["prov"] = [
                {
                    "page_no": 1,
                    "bbox": {"l": l, "t": t, "r": r, "b": b, "coord_origin": "TOPLEFT"},
                    "charspan": [0, 0],
                }
            ]

    for it in doc.texts[:3]:
        if it.get("label") in ("title", "text", "section_header"):
            _ensure_prov(it, 10.0, 10.0, 200.0, 40.0)
    if doc.tables:
        _ensure_prov(doc.tables[0], 20.0, 80.0, 300.0, 200.0)
    if doc.pictures:
        _ensure_prov(doc.pictures[0], 320.0, 80.0, 500.0, 220.0)

    actual = export_to_azure(doc)
    assert json.loads(actual) == json.loads(load_gt("doc/constructed.gt.azure.json"))


@pytest.mark.parametrize(
    "fn,gt",
    [
        (lambda d: _md(d), "constructed_document.yaml.md"),
        (lambda d: _html(d), "constructed_document.yaml.html"),
        (lambda d: _dt(d), "constructed_document.yaml.dt"),
        (lambda d: _et(d), "constructed_document.yaml.et"),
        (lambda d: _vtt(d), "constructed_document.yaml.vtt"),
    ],
    ids=["md", "html", "dt", "et", "vtt"],
)
def test_constructed_document_exports(fn, gt):
    """reference test_construct_doc export methods over the sample doc."""
    assert fn(_sample_doc()).rstrip() == load_gt(f"doc/{gt}").rstrip()


def test_element_tree_2206():
    doc = Doc.from_dict(load_doc_json("doc/2206.01062.yaml"))
    assert _et(doc).rstrip() == load_gt("doc/2206.01062.yaml.et").rstrip()


def _md(d):
    from docling_core_spark.functions.serializers import export_to_markdown

    return export_to_markdown(d)


def _html(d):
    from docling_core_spark.functions.html_out import export_to_html

    return export_to_html(d)


def _dt(d):
    from docling_core_spark.functions.doctags import export_to_doctags

    return export_to_doctags(d)


def _et(d):
    from docling_core_spark.functions.serializers import export_to_element_tree

    return export_to_element_tree(d)


def _vtt(d):
    from docling_core_spark.functions.webvtt_out import export_to_webvtt

    return export_to_webvtt(d)
