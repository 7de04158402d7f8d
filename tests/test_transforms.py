"""filter/concatenate re-indexing invariants (GT inputs not all shipped)."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.serializers import export_to_markdown
from docling_core_spark.model.doc import Doc
from docling_core_spark.model.transform import concatenate, filter_pages

from .conftest import load_doc_json


def _assert_refs_consistent(doc: Doc) -> None:
    seen = set()
    for item, _ in doc.iterate_items(with_groups=True, traverse_pictures=True,
                                     included_content_layers={"body", "furniture", "background", "invisible", "notes"}):
        sr = item["self_ref"]
        assert sr not in seen, f"duplicate ref {sr}"
        seen.add(sr)
        for ref in item.get("children", ()):
            child = doc.resolve(ref["$ref"])
            assert child["parent"]["$ref"] == sr, f"parent mismatch for {ref['$ref']}"
    # array positions must match self_refs
    for arr in ("texts", "tables", "pictures", "groups"):
        for i, it in enumerate(getattr(doc, arr)):
            assert it["self_ref"] == f"#/{arr}/{i}"


def test_filter_identity_preserves_serialization():
    doc = Doc.from_dict(load_doc_json("doc/activities.json"))
    filtered = filter_pages(doc)  # no page filter = pure re-index
    _assert_refs_consistent(filtered)
    assert export_to_markdown(filtered) == export_to_markdown(doc)


def test_filter_single_page():
    doc = Doc.from_dict(load_doc_json("doc/activities.json"))
    p2 = filter_pages(doc, page_nrs={2})
    _assert_refs_consistent(p2)
    # reference semantics: page numbers are preserved (delta keys off the
    # doc's min page, not the filter set)
    assert set(p2.pages) == {"2"}
    for t in p2.texts:
        for prov in t.get("prov", ()):
            assert prov["page_no"] == 2


def test_filter_invalid_page_raises():
    doc = Doc.from_dict(load_doc_json("doc/activities.json"))
    with pytest.raises(ValueError, match="not present"):
        filter_pages(doc, page_nrs={99})


def test_concatenate_shifts_pages_and_reindexes():
    a = Doc.from_dict(load_doc_json("doc/activities.json"))
    b = Doc.from_dict(load_doc_json("doc/barchart.json"))
    merged = concatenate([a, b])
    _assert_refs_consistent(merged)
    assert len(merged.texts) == len(a.texts) + len(b.texts)
    assert len(merged.pages) == len(a.pages) + len(b.pages)
    max_a = max(int(k) for k in a.pages)
    assert set(int(k) for k in merged.pages) == set(range(1, max_a + len(b.pages) + 1))
    # markdown of the merge = markdown of the parts joined
    md_a, md_b = export_to_markdown(a), export_to_markdown(b)
    assert export_to_markdown(merged) == f"{md_a}\n\n{md_b}"


def test_concatenate_squeezes_names():
    a = Doc.from_dict(load_doc_json("doc/activities.json"))
    assert concatenate([a, a, a]).name == a.name
