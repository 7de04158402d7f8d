"""T6/T7 mutation op tests: invariants + serialization effects."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.serializers import export_to_markdown
from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc
from docling_core_spark.model.mutate import (
    append_child,
    delete_items,
    flatten,
    hierarchize,
    insert_sibling,
    replace_item,
)

from .conftest import load_doc_json
from .test_transforms import _assert_refs_consistent


def _small_doc() -> Doc:
    d = Doc(name="t")
    d.add_heading("H1", level=1)
    d.add_text("text", "one")
    d.add_text("text", "two")
    lg = d.add_list_group()
    d.add_list_item("a", parent=lg)
    d.add_list_item("b", parent=lg)
    return d


def test_insert_before_and_after():
    d = _small_doc()
    anchor = d.texts[1]  # "one"
    insert_sibling(d, {"label": "text", "text": "before", "orig": "before", "prov": []}, "texts", anchor, after=False)
    insert_sibling(d, {"label": "text", "text": "after", "orig": "after", "prov": []}, "texts", anchor, after=True)
    md = export_to_markdown(d)
    assert md.index("before") < md.index("one") < md.index("after") < md.index("two")


def test_insert_sibling_of_body_raises():
    d = _small_doc()
    with pytest.raises(ValueError):
        insert_sibling(d, {"label": "text", "text": "x", "orig": "x", "prov": []}, "texts", d.body)


def test_delete_text_shifts_refs():
    d = _small_doc()
    delete_items(d, [d.texts[1]])  # delete "one"
    _assert_refs_consistent(d)
    md = export_to_markdown(d)
    assert "one" not in md and "two" in md


def test_delete_group_deletes_subtree():
    d = _small_doc()
    delete_items(d, [d.groups[0]])
    _assert_refs_consistent(d)
    assert not d.groups
    assert all(t.get("label") != M.LIST_ITEM for t in d.texts)


def test_delete_on_real_fixture():
    d = Doc.from_dict(load_doc_json("doc/activities.json"))
    n_before = len(d.texts)
    delete_items(d, [d.texts[3], d.groups[0]])
    _assert_refs_consistent(d)
    assert len(d.texts) < n_before
    export_to_markdown(d)  # still serializes


def test_replace_item():
    d = _small_doc()
    old = d.texts[1]
    replace_item(d, old, {"label": "text", "text": "NEW", "orig": "NEW", "prov": []}, "texts")
    _assert_refs_consistent(d)
    md = export_to_markdown(d)
    assert "NEW" in md and "one" not in md


def test_append_child_rejects_children():
    d = _small_doc()
    with pytest.raises(ValueError):
        append_child(d, {"label": "text", "text": "x", "orig": "x", "children": [{"$ref": "#/texts/0"}]}, "texts")


def test_hierarchize_and_flatten_roundtrip():
    d = Doc(name="h")
    d.add_heading("A", level=1)
    d.add_text("text", "under A")
    d.add_heading("B", level=2)
    d.add_text("text", "under B")
    d.add_heading("C", level=1)
    d.add_text("text", "under C")
    before = export_to_markdown(d)
    hierarchize(d)
    _assert_refs_consistent(d)
    # structure: body -> [A, C]; A -> [under A, B]; B -> [under B]
    assert [r["$ref"] for r in d.body["children"]] == ["#/texts/0", "#/texts/4"]
    a = d.texts[0]
    assert [r["$ref"] for r in a["children"]] == ["#/texts/1", "#/texts/2"]
    # reading order (and therefore markdown) is unchanged
    assert export_to_markdown(d) == before
    flatten(d)
    _assert_refs_consistent(d)
    assert [r["$ref"] for r in d.body["children"]] == [f"#/texts/{i}" for i in range(6)]
    assert export_to_markdown(d) == before
