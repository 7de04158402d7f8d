"""Custom meta field helpers + relaxed annotation migration
(reference test_metadata.py:78-132, common/meta.py custom-field surface)."""

from __future__ import annotations

import pytest
import yaml

from docling_core_spark.model.doc import (
    Doc,
    check_custom_meta_field,
    create_meta_field_name,
    get_meta_custom_part,
    set_meta_custom_field,
)

from .conftest import require_ref_data


def _load_yaml_doc(name: str) -> Doc:
    path = require_ref_data().parent / "data" / "doc" / name
    return Doc.from_dict(yaml.safe_load(path.read_text()))


def test_set_custom_field_and_modified_gt():
    """Mirrors reference test_metadata_usage: set my_corp__coords on
    #/texts/2 and match the committed dummy_doc_with_meta_modified.yaml."""
    doc = _load_yaml_doc("dummy_doc_with_meta.yaml")
    item = doc.resolve("#/texts/2")
    assert item.get("meta") is not None

    value = {"longitude": 47.3769, "latitude": 8.5417}
    key = set_meta_custom_field(item, namespace="my_corp", name="coords", value=value)
    assert key == "my_corp__coords"

    expected = _load_yaml_doc("dummy_doc_with_meta_modified.yaml")
    exp_item = expected.resolve("#/texts/2")
    assert item["meta"][key] == exp_item["meta"][key]
    assert get_meta_custom_part(item["meta"])[key] == value

    # full-document parity with the committed modified fixture
    # (uri keys stripped on both sides, as the reference archive tests do)
    def strip_uri(obj):
        if isinstance(obj, dict):
            return {k: strip_uri(v) for k, v in obj.items() if k != "uri"}
        if isinstance(obj, list):
            return [strip_uri(x) for x in obj]
        return obj

    act = strip_uri(doc.to_dict())
    exp = strip_uri(expected.to_dict())
    # the modified fixture was re-saved by a newer reference (schema version
    # bumped on save); everything else must match
    act.pop("version"), exp.pop("version")
    assert act == exp


def test_custom_field_format_validation():
    assert create_meta_field_name(namespace="a", name="b") == "a__b"
    with pytest.raises(ValueError):
        check_custom_meta_field("no_delimiter")
    with pytest.raises(ValueError):
        check_custom_meta_field("__leading")
    with pytest.raises(ValueError):
        check_custom_meta_field("trailing__")
    with pytest.raises(ValueError):
        set_meta_custom_field({}, namespace="", name="x", value=1)


def test_relaxed_migration_skips_existing_meta():
    """reference test_metadata_relaxed_migration: when meta.classification
    already exists, the legacy annotation (confidence 0.78) must NOT
    overwrite it — the 0.42 prediction survives the load."""
    doc = _load_yaml_doc("dummy_doc_with_meta_2.yaml")
    pic = doc.pictures[0]
    preds = pic["meta"]["classification"]["predictions"]
    assert preds[0]["confidence"] == 0.42


def test_migration_applies_when_meta_absent():
    doc = _load_yaml_doc("dummy_doc_with_meta.yaml")
    pic = doc.pictures[0]
    preds = pic["meta"]["classification"]["predictions"]
    assert preds[0]["confidence"] == 0.78


def test_get_custom_part_excludes_standard_fields():
    meta = {"summary": {"text": "x"}, "my_corp__f": 1, "docling_legacy__misc": {"a": 2}}
    assert get_meta_custom_part(meta) == {"my_corp__f": 1, "docling_legacy__misc": {"a": 2}}
    assert get_meta_custom_part(None) == {}
