"""Byte-parity of DocLang field-kv / form-graph serialization vs reference GT
(reference test/test_serialization_doclang.py:858-1333: test_kv, test_kv_invoice,
test_kv_advanced_inline, test_kv_nested, test_kv_form_with_table,
test_kv_migration_* and the kv/ + doclang_ref/ annotation fixture dirs)."""

from __future__ import annotations

import json

import pytest

from docling_core_spark.functions.doclang_out import export_to_doclang
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt, require_ref_data


def _doc(name: str) -> Doc:
    return Doc.from_dict(load_doc_json(f"doc/{name}.json"))


def _assert_gt(actual: str, gt_relpath: str):
    expected = load_gt(gt_relpath).rstrip()
    assert actual.rstrip() == expected


@pytest.mark.parametrize(
    "src,gt,kw",
    [
        ("kv.out", "kv.out", {}),
        ("kv_advanced_inline.out", "kv_advanced_inline.out", {}),
        ("kv_nested.out", "kv_nested.out", {}),
        ("kv_form_with_table.out", "kv_form_with_table.out", {}),
        ("kv_invoice.out", "kv_invoice.out", {"image_mode": "placeholder"}),
        ("kv_invoice.out", "kv_invoice_embedded.out", {"image_mode": "embedded"}),
        # the post-migration dump serializes to the migration GT directly
        ("kv_post_migration.out", "kv_migration.out", {}),
    ],
)
def test_kv_serialization(src, gt, kw):
    out = export_to_doclang(_doc(src), include_version=False, **kw)
    _assert_gt(out, f"doc/{gt}.dclg.xml")


def test_rich_table_cell_grid_dump_roundtrip():
    """to_dict drops RichTableCell refs from the computed grid, like the
    reference dump (table_cells keep them)."""
    raw = load_doc_json("doc/kv_form_with_table.out.json")
    assert Doc.from_dict(json.loads(json.dumps(raw))).to_dict() == raw


def _annot_dirs():
    base = require_ref_data() / "doc"
    dirs = [d for d in sorted((base / "kv").iterdir()) if (d / "output.json").exists()]
    dirs += [
        d
        for d in sorted((base / "doclang_ref").iterdir())
        if (d / "output.json").exists()
    ]
    return dirs


@pytest.mark.parametrize("subdir", _annot_dirs(), ids=lambda d: d.name[:24])
def test_kv_annot_output_serialization(subdir):
    doc = Doc.from_dict(json.loads((subdir / "output.json").read_text()))
    out = export_to_doclang(doc, include_version=False)
    assert out.rstrip() == (subdir / "output.dclg.xml").read_text().rstrip()

    out_nc = export_to_doclang(doc, include_version=False, add_content=False)
    assert (
        out_nc.rstrip() == (subdir / "output_no_content.dclg.xml").read_text().rstrip()
    )


# -- deserializer round trips (reference test_deserializer_doclang.py:1882-2030) --

from docling_core_spark.functions.doclang_load import load_from_doclang  # noqa: E402

_KV_ANNOT_XML_LOSSLESS = frozenset(
    {
        "01d07afe1cb54ecd23eedfe4d91b81dd88e61bf4e0dbe2467784db4177a6c691",
        "08212053e2db1a70dd60a4f85650ceb33d7519af34f502e3ac894389d76663d6",
        "1eac20e5ac5fac655a611343f86927d6a76277e170430c1eba741585437a2e90",
        "ba4120cada21304563625490e9ad13911e96114d3f07df056a6bf62397a859e1",
    }
)


def _roundtrip(subdir, src_name: str, ser_name: str, **ser_kw):
    doc = Doc.from_dict(json.loads((subdir / src_name).read_text()))
    dt = export_to_doclang(doc, include_version=False, **ser_kw)
    assert dt.rstrip() == (subdir / ser_name).read_text().rstrip()

    doc2 = load_from_doclang(dt)
    expected = json.loads((subdir / "deserialized.json").read_text())
    got = doc2.to_dict()
    got["version"] = expected["version"]
    got["name"] = expected["name"]
    assert got == expected

    dt2 = export_to_doclang(doc2, include_version=False, **ser_kw)
    assert dt2.rstrip() == (subdir / "reserialized.dclg.xml").read_text().rstrip()
    return dt, dt2


@pytest.mark.parametrize(
    "fixture_dir",
    ["field_region_kv_migration", "field_region_kv", "field_region_kv_invoice"],
)
def test_field_region_doclang_roundtrip(fixture_dir):
    subdir = require_ref_data() / "doc" / fixture_dir
    kw = {"image_mode": "placeholder"} if fixture_dir == "field_region_kv_invoice" else {}
    dt, dt2 = _roundtrip(subdir, "input.json", "serialized.dclg.xml", **kw)
    assert dt.strip() == dt2.strip()


def _kv_annot_roundtrip_dirs():
    base = require_ref_data() / "doc" / "kv"
    return [d for d in sorted(base.iterdir()) if (d / "deserialized.json").exists()]


@pytest.mark.parametrize("subdir", _kv_annot_roundtrip_dirs(), ids=lambda d: d.name[:24])
def test_kv_annot_doclang_roundtrip(subdir):
    dt, dt2 = _roundtrip(subdir, "output.json", "output.dclg.xml")
    if subdir.name in _KV_ANNOT_XML_LOSSLESS:
        assert dt.strip() == dt2.strip()


def _annot_migration_dirs():
    base = require_ref_data() / "doc"
    dirs = [d for d in sorted((base / "kv").iterdir()) if (d / "input.json").exists()]
    dirs += [
        d for d in sorted((base / "doclang_ref").iterdir()) if (d / "input.json").exists()
    ]
    return dirs


@pytest.mark.parametrize("subdir", _annot_migration_dirs(), ids=lambda d: d.name[:24])
def test_kv_annot_migration(subdir):
    """input.json --migrate_to_field_regions--> output.json, byte parity
    (reference test_kv_migration_annot_scenario + document.py:381-765)."""
    doc = Doc.from_dict(json.loads((subdir / "input.json").read_text()))
    doc.migrate_to_field_regions()
    expected = json.loads((subdir / "output.json").read_text())
    got = doc.to_dict()
    got["version"] = expected["version"]
    assert got == expected


@pytest.mark.parametrize("fixture_dir", ["multi_page_roundtrip", "multi_prov_thread"])
def test_doclang_roundtrip_dirs(fixture_dir):
    """Multi-page and multi-provenance-thread DocLang roundtrips
    (reference test_deserializer_doclang.py fixture dirs)."""
    subdir = require_ref_data() / "doc" / fixture_dir
    _roundtrip(subdir, "input.json", "serialized.dclg.xml")
