"""Assorted fixture GT parity: metadata markdown variants, dummy-doc exports,
inline-and-formatting serializations, misplaced-list-item load normalization
(reference test_metadata.py:146-215, test_serialization.py,
test_latex_serialization.py:47, test_docling_doc.py:1703-1724)."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.doctags import export_to_doctags
from docling_core_spark.functions.html_out import export_to_html
from docling_core_spark.functions.latex_out import export_to_latex
from docling_core_spark.functions.serializers import (
    export_to_element_tree,
    export_to_markdown,
)
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt


def _doc(name: str) -> Doc:
    return Doc.from_dict(load_doc_json(f"doc/{name}"))


@pytest.mark.parametrize(
    "kw,gt",
    [
        ({}, "group_with_metadata_default.md"),
        (dict(mark_meta=True), "group_with_metadata_marked.md"),
        (dict(mark_meta=True, allowed_meta_names={"my_corp__test_1"}),
         "group_with_metadata_allowed_meta_names.md"),
        (dict(mark_meta=True, blocked_meta_names={"my_corp__test_1", "summary"}),
         "group_with_metadata_blocked_meta_names.md"),
        (dict(mark_meta=True, include_non_meta=False),
         "group_with_metadata_without_non_meta.md"),
    ],
    ids=["default", "marked", "allowed", "blocked", "meta_only"],
)
def test_group_metadata_markdown_variants(kw, gt):
    doc = _doc("group_with_metadata.yaml")
    assert export_to_markdown(doc, **kw).rstrip() == load_gt(f"doc/{gt}").rstrip()


@pytest.mark.parametrize(
    "fn,gt",
    [
        (lambda d: export_to_markdown(d), "dummy_doc.yaml.md"),
        (lambda d: export_to_html(d), "dummy_doc.yaml.html"),
        (lambda d: export_to_doctags(d), "dummy_doc.yaml.dt"),
        (lambda d: export_to_doctags(d, minified=True), "dummy_doc.yaml.min.dt"),
        (lambda d: export_to_element_tree(d), "dummy_doc.yaml.et"),
    ],
    ids=["md", "html", "dt", "min_dt", "et"],
)
def test_dummy_doc_exports(fn, gt):
    assert fn(_doc("dummy_doc.yaml")).rstrip() == load_gt(f"doc/{gt}").rstrip()


def test_dummy_doc_with_meta_doctags():
    out = export_to_doctags(_doc("dummy_doc_with_meta.yaml"))
    assert out.rstrip() == load_gt("doc/dummy_doc_with_meta.gt.dt").rstrip()


def test_inline_and_formatting_latex_doctags():
    doc = _doc("inline_and_formatting.yaml")
    tex = export_to_latex(doc, image_mode="placeholder", page_break_command=None)
    assert tex.rstrip() == load_gt("doc/inline_and_formatting.gt.tex").rstrip()
    assert export_to_doctags(doc).rstrip() == load_gt("doc/inline_and_formatting.gt.dt").rstrip()


def test_misplaced_list_items_normalize_on_load():
    doc = _doc("misplaced_list_items.yaml")
    out = export_to_doctags(doc)
    assert out.rstrip() == load_gt("doc/misplaced_list_items.yaml.dt").rstrip()

    expected = load_doc_json("doc/misplaced_list_items.out.yaml")
    got = doc.to_dict()
    got["version"] = expected["version"]
    assert got == expected

    doc.normalize_references()
    expected = load_doc_json("doc/misplaced_list_items.norm.out.yaml")
    got = doc.to_dict()
    got["version"] = expected["version"]
    assert got == expected


def test_export_with_precision():
    """to_dict(coord_precision, confid_precision) rounds coordinates/sizes
    and confidences (reference test_docling_doc.py:1735-1746)."""
    doc = _doc("dummy_doc_2.yaml")
    expected = load_doc_json("doc/dummy_doc_2_prec.yaml")
    got = doc.to_dict(coord_precision=2, confid_precision=1)
    got["version"] = expected["version"]
    assert got == expected
    # the live model keeps full precision
    assert doc.to_dict()["texts"][0]["prov"][0]["bbox"]["l"] == 21.342


def test_docitem_comments_field():
    """reference test_docling_doc.py:2327-2349."""
    doc = Doc(name="test_comments")
    doc.add_text("text", "Normal text without comment.")
    text = doc.add_text("text", "This text has a comment attached.")
    doc.add_comment("[John Reviewer]: This is a reviewer comment.", targets=[text])
    expected = load_doc_json("doc/docitem_comments_field.out.yaml")
    got = doc.to_dict()
    got["version"] = expected["version"]
    assert got == expected


def test_docitem_comments_multiple():
    """reference test_docling_doc.py:2352-2388."""
    doc = Doc(name="test_multiple_comments")
    t1 = doc.add_text("text", "Text 1.")
    t2 = doc.add_text("text", "Text 2.")
    t3 = doc.add_text("text", "Text 3.")
    doc.add_comment("[Reviewer A]: This is a comment on texts 1 and 2.", targets=[t1, t2])
    doc.add_comment(
        "[Reviewer B]: This is a comment on texts 2 (range [0,6)) and 3.",
        targets=[(t2, (0, 6)), t3],
    )
    expected = load_doc_json("doc/docitem_comments_multiple.out.yaml")
    got = doc.to_dict()
    got["version"] = expected["version"]
    assert got == expected


def test_docitem_comments_delete_updates_refs():
    """reference test_docling_doc.py:2391-2421."""
    from docling_core_spark.model.mutate import delete_items

    doc = Doc(name="test_comments_delete")
    para1 = doc.add_text("paragraph", "First paragraph.")
    para2 = doc.add_text("paragraph", "Second paragraph with comment.")
    doc.add_comment("Comment on second paragraph.", targets=[para2])
    delete_items(doc, [para1])
    updated = doc.texts[0]
    assert len(updated["comments"]) == 1
    resolved = doc.resolve(updated["comments"][0]["$ref"])
    assert resolved["text"] == "Comment on second paragraph."
