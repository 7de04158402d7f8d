"""T8 validation tests (mirrors reference validate_tree / _validate_rules)."""

from __future__ import annotations

import pytest

from docling_core_spark.model.doc import Doc
from docling_core_spark.model.validate import (
    validate_document,
    validate_rules,
    validate_tree,
    validate_unique_refs,
)

from .conftest import load_doc_json


def _bad_doc() -> Doc:
    """Replica of the reference _construct_bad_doc (test_docling_doc.py:754)."""
    doc = Doc(name="Bad doc")
    title = doc.add_title("This is the title")
    group = doc.add_group(parent=title, name="chapter 1")
    text = doc.add_heading("This is the first section", level=1, parent=group)
    text["parent"] = {"$ref": title["self_ref"]}  # bend the parent
    return doc


def test_bad_doc_fails_tree_validation():
    doc = _bad_doc()
    assert not validate_tree(doc)
    with pytest.raises(ValueError, match="hierarchy is inconsistent"):
        validate_tree(doc, raise_on_error=True)


@pytest.mark.parametrize("name", ["activities.json", "2206.01062.yaml", "polymers.json"])
def test_fixtures_validate(name):
    doc = Doc.from_dict(load_doc_json(f"doc/{name}"))
    report = validate_document(doc)
    assert report["tree_ok"] and report["refs_ok"]


def test_rule_violations_reported():
    doc = Doc(name="r")
    lg = doc.add_list_group()
    doc.add_text("text", "not a list item", parent=lg)  # non-ListItem in list group
    doc.add_list_item("orphan-style", parent=None)  # ListItem under body
    empty = doc.add_group(name="empty")
    problems = validate_rules(doc, raise_on_error=False)
    assert any("non-ListItem" in p for p in problems)
    assert any("non-ListGroup parent" in p for p in problems)
    assert any("has no children" in p for p in problems)


def test_unique_refs_detects_corruption():
    doc = Doc(name="c")
    doc.add_text("text", "a")
    doc.texts[0]["self_ref"] = "#/texts/7"
    assert not validate_unique_refs(doc)
