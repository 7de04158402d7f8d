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
