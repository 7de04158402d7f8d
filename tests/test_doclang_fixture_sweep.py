"""Sweep of the remaining reference DocLang GT fixtures, plus a completeness
gate enumerating every /root/reference/test/data/doc/*.dclg.xml: each file must
be exercised by a test in this repo or appear in the explicit skip-list below.

Reference generators: test_serialization_doclang.py, test_deserializer_doclang.py,
test_hierarchy.py (file:line cited per test)."""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from docling_core_spark.functions.doclang_load import load_from_doclang
from docling_core_spark.functions.doclang_out import export_to_doclang
from docling_core_spark.model.doc import Doc
from docling_core_spark.model.mutate import flatten, hierarchize

from .conftest import load_doc_json, load_gt, require_ref_data

# fixtures intentionally not exercised, with the reason
SKIP_LIST = {
    "virtual_texts.gt.dclg.xml": "orphan fixture: no reference test generates it",
}


def _assert_gt(actual: str, gt_name: str):
    assert actual.rstrip() == load_gt(f"doc/{gt_name}").rstrip()


def _prov(bbox=(1, 2, 3, 4), page_no=1, charspan=(0, 2), origin="BOTTOMLEFT"):
    x0, y0, x1, y1 = bbox
    t, b = (max(y0, y1), min(y0, y1)) if origin == "BOTTOMLEFT" else (min(y0, y1), max(y0, y1))
    return [
        {
            "page_no": page_no,
            "bbox": {"l": float(x0), "t": float(t), "r": float(x1), "b": float(b),
                     "coord_origin": origin},
            "charspan": list(charspan),
        }
    ]


def _cell(i, j, text="", **kw):
    cell = {
        "start_row_offset_idx": i,
        "end_row_offset_idx": i + 1,
        "start_col_offset_idx": j,
        "end_col_offset_idx": j + 1,
        "text": text,
    }
    cell.update(kw)
    return cell


def test_dummy_doc_with_meta():
    """test_serialization_doclang.py:236-246."""
    doc = Doc.from_dict(load_doc_json("doc/dummy_doc_with_meta.yaml"))
    _assert_gt(
        export_to_doclang(doc, include_version=False, image_mode="embedded"),
        "dummy_doc_with_meta.gt.dclg.xml",
    )


def test_picture_body_children():
    """test_serialization_doclang.py:593-620."""
    doc = Doc(name="picture_body_children")
    pic = doc.add_picture()
    inline = doc.add_inline_group(parent=pic)
    doc.add_text("text", "Hello ", parent=inline)
    doc.add_text("text", "world", parent=inline, formatting={"bold": True})
    doc.add_formula(r"E=mc^2", parent=pic)
    _assert_gt(export_to_doclang(doc, include_version=False), "picture_body_children.gt.dclg.xml")


def _rich_table_doc() -> Doc:
    """Reference conftest.py:363-455."""
    doc = Doc(name="")
    doc.add_title("Rich tables")
    table = doc.add_table(data={"table_cells": [], "num_rows": 5, "num_cols": 2})

    rich_1 = doc.add_text("text", "text in italic", parent=table, formatting={"italic": True})
    rich_2 = doc.add_list_group(parent=table)
    doc.add_list_item("list item 1", parent=rich_2)
    doc.add_list_item("list item 2", parent=rich_2)
    rich_3 = doc.add_table(data={"table_cells": [], "num_rows": 2, "num_cols": 3}, parent=table)
    rich_4 = doc.add_group(parent=table)
    doc.add_text("text", "Some text in a generic group.", parent=rich_4)
    doc.add_text("text", "More text in the group.", parent=rich_4)

    for i in range(2):
        for j in range(3):
            doc.add_table_cell(rich_3, _cell(i, j, f"inner cell {i},{j}"))

    rich_at = {(1, 1): rich_1, (2, 0): rich_2, (3, 1): rich_3, (4, 0): rich_4}
    for i in range(5):
        for j in range(2):
            if (i, j) in rich_at:
                cell = _cell(i, j, f"cell {i},{j}", ref={"$ref": rich_at[(i, j)]["self_ref"]})
            else:
                cell = _cell(i, j, f"cell {i},{j}")
            doc.add_table_cell(table, cell)
    return doc


def test_rich_cells():
    """test_serialization_doclang.py:746-754."""
    _assert_gt(export_to_doclang(_rich_table_doc(), include_version=False), "rich_table.out.dclg.xml")


def _simple_prov_doc() -> Doc:
    doc = Doc(name="")
    doc.add_page(1, 100.0, 100.0)
    doc.add_text("text", "Hello", prov=_prov())
    doc.add_text("text", "World", prov=_prov())
    return doc


@pytest.mark.parametrize("res,gt", [(512, "simple_prov_res_512.out.dclg.xml"),
                                    (256, "simple_prov_res_256.out.dclg.xml")])
def test_simple_prov_resolutions(res, gt):
    """test_serialization_doclang.py:779-840."""
    out = export_to_doclang(_simple_prov_doc(), include_version=False, xsize=res, ysize=res)
    _assert_gt(out, gt)


def test_barchart():
    """test_serialization_doclang.py:841-847."""
    doc = Doc.from_dict(load_doc_json("doc/barchart.json"))
    _assert_gt(export_to_doclang(doc, include_version=False), "barchart.out.dclg.xml")


def _doc_with_layers() -> Doc:
    """Reference conftest.py:596-640."""
    doc = Doc(name="")
    doc.add_page(1, 100.0, 100.0)
    doc.add_text("page_header", "Page Header", prov=_prov((1, 2, 3, 4), charspan=(0, 11)),
                 content_layer="furniture")
    doc.add_text("text", "Main body content", prov=_prov((5, 6, 7, 8), charspan=(0, 17)),
                 content_layer="body")
    doc.add_text("page_footer", "Page Footer", prov=_prov((9, 10, 11, 12), charspan=(0, 11)),
                 content_layer="furniture")
    return doc


@pytest.mark.parametrize(
    "kw,gt",
    [
        ({"layer_mode": "auto"}, "layer_minimal_mode.dclg.xml"),
        ({"layer_mode": "always"}, "layer_always_mode.dclg.xml"),
        ({"layers": frozenset({"body"})}, "layer_only_body.dclg.xml"),
    ],
)
def test_layer_modes(kw, gt):
    """test_serialization_doclang.py:1610-1645."""
    _assert_gt(export_to_doclang(_doc_with_layers(), include_version=False, **kw), gt)


_NEWLINE_CODE = """


import pytest

from docling_core.transforms.serializer.doclang import (
    ContentType,
    EscapeMode,
    DocLangDocSerializer,
    DocLangParams,
    DocLangVocabulary,
    LayerMode,
    WrapMode,
)
 """


def test_newline_to_br():
    """test_serialization_doclang.py:1741-1778 (code payload quoted from the
    committed fixture)."""
    doc = Doc(name="")
    doc.add_text("text", "foo\nbar")
    inl = doc.add_inline_group()
    doc.add_text("text", "eins\n", parent=inl)
    doc.add_text("text", " zwei\n ", parent=inl)
    doc.add_text("text", "drei", parent=inl, formatting={"bold": True})
    doc.add_code(_NEWLINE_CODE)
    doc.add_text("text", "\n")
    _assert_gt(export_to_doclang(doc, include_version=False), "newline_to_br.dclg.xml")


def test_list_item_with_code_child():
    """test_serialization_doclang.py:1781-1792."""
    doc = Doc(name="test")
    lst = doc.add_list_group()
    li = doc.add_list_item("", parent=lst, marker="•")
    doc.add_code("print('hello')", parent=li)
    _assert_gt(export_to_doclang(doc, include_version=False), "list_item_with_code.gt.dclg.xml")


def test_list_item_with_code_child_and_bbox():
    """test_serialization_doclang.py:1795-1819."""
    doc = Doc(name="test")
    doc.add_page(0, 100.0, 100.0)
    lst = doc.add_list_group()
    li = doc.add_list_item("", parent=lst, marker="•")
    doc.add_code(
        "print('hello')", parent=li,
        prov=_prov((10, 20, 80, 60), page_no=0, charspan=(0, 0), origin="TOPLEFT"),
    )
    out = export_to_doclang(doc, include_version=False, add_location=True, xsize=256, ysize=256)
    _assert_gt(out, "list_item_with_code_and_bbox.gt.dclg.xml")


def _virtual_text_doc(add_location: bool) -> Doc:
    """test_serialization_doclang.py:1825-1905."""
    doc = Doc(name="test_virtual_texts")
    if add_location:
        doc.add_page(1, 100.0, 100.0)
    lg = doc.add_list_group()
    prov = _prov((10, 20, 30, 25), charspan=(0, 12)) if add_location else None
    doc.add_list_item("Regular item", parent=lg, prov=prov)
    li_with_code = doc.add_list_item("", parent=lg)
    doc.add_code("print('hello')", parent=li_with_code, code_language="Python")
    prov2 = _prov((10, 30, 30, 35), charspan=(0, 12)) if add_location else None
    doc.add_list_item("Another item", parent=lg, prov=prov2)

    table_prov = _prov((2, 40, 90, 80), charspan=(0, 50)) if add_location else None
    table = doc.add_table(data={"table_cells": [], "num_rows": 2, "num_cols": 2},
                          prov=table_prov)
    for i in range(2):
        for j in range(2):
            if i == 1 and j == 1:
                formula = doc.add_formula("E=mc^2", parent=table)
                cell = _cell(i, j, "", ref={"$ref": formula["self_ref"]})
            else:
                cell = _cell(i, j, f"Cell {i * 2 + j + 1}")
                if prov2 and i + j == 0:
                    cell["bbox"] = prov2[0]["bbox"]
            doc.add_table_cell(table, cell)
    return doc


@pytest.mark.parametrize(
    "virtual,loc,gt",
    [
        (True, False, "virtual_texts_true_no_loc.gt.dclg.xml"),
        (True, True, "virtual_texts_true_with_loc.gt.dclg.xml"),
        (False, False, "virtual_texts_false_no_loc.gt.dclg.xml"),
        (False, True, "virtual_texts_false_with_loc.gt.dclg.xml"),
    ],
)
def test_virtual_texts(virtual, loc, gt):
    """test_serialization_doclang.py:1908-1969."""
    doc = _virtual_text_doc(add_location=loc)
    out = export_to_doclang(
        doc, include_version=False, use_virtual_text=virtual,
        add_location=loc, add_table_cell_location=loc,
    )
    _assert_gt(out, gt)


def test_include_namespace_and_version():
    """test_serialization_doclang.py:1972-1982."""
    doc = Doc(name="test")
    doc.add_text("text", "Hello world")
    out = export_to_doclang(doc, include_namespace=True, include_version=True)
    _assert_gt(out, "include_namespace_and_version.gt.dclg.xml")


def test_deserialize_include_namespace_and_version():
    """test_deserializer_doclang.py:139-156."""
    xml = load_gt("doc/deserialize_include_namespace_and_version.gt.dclg.xml")
    doc = load_from_doclang(xml)
    assert len(doc.texts) == 1
    assert doc.texts[0]["text"] == "Hello world"
    out = export_to_doclang(doc, include_namespace=True, include_version=True)
    _assert_gt(out, "deserialize_include_namespace_and_version.gt.dclg.xml")


def test_rtl_text():
    """test_serialization_doclang.py:2370-2390."""
    doc = Doc(name="rtl_text")
    doc.add_text("text", "مرحبا")
    out = export_to_doclang(doc, include_version=False, add_location=False)
    _assert_gt(out, "rtl_text.gt.dclg.xml")


def test_table_xcel_span():
    """test_serialization_doclang.py:2394-2436."""
    doc = Doc(name="table_xcel")
    cells = [
        {
            "text": "A", "row_span": 2, "col_span": 2,
            "start_row_offset_idx": 0, "end_row_offset_idx": 2,
            "start_col_offset_idx": 0, "end_col_offset_idx": 2,
        }
    ]
    doc.add_table(data={"table_cells": cells, "num_rows": 2, "num_cols": 2})
    out = export_to_doclang(doc, include_version=False, add_location=False,
                            add_table_cell_location=False)
    _assert_gt(out, "table_xcel.gt.dclg.xml")
    assert "<lcel/>" in out and "<ucel/>" in out
    assert out.index("<xcel/>") > out.index("<ucel/>")


def test_table_corn_header():
    """test_serialization_doclang.py:2443-2507."""
    doc = Doc(name="table_corn")
    cells = [
        _cell(0, 0, "", column_header=True, row_header=True),
        _cell(0, 1, "Col1", column_header=True),
        _cell(1, 0, "Row1", row_header=True),
        _cell(1, 1, "Data"),
    ]
    doc.add_table(data={"table_cells": cells, "num_rows": 2, "num_cols": 2})
    out = export_to_doclang(doc, include_version=False, add_location=False,
                            add_table_cell_location=False)
    _assert_gt(out, "table_corn.gt.dclg.xml")


def test_roundtrip_list_item_with_inline():
    """test_deserializer_doclang.py:978-994 (uses the same section builders
    as the default-mode GT test)."""
    from .test_doclang_gt import _add_list_section, _add_texts_section

    doc = Doc(name="t")
    _add_texts_section(doc)
    _add_list_section(doc)

    dt = export_to_doclang(doc, include_version=False)
    _assert_gt(dt, "roundtrip_list_item_with_inline_serialized.dclg.xml")

    doc2 = load_from_doclang(dt)
    expected = load_doc_json("doc/roundtrip_list_item_with_inline_deserialized.yaml")
    got = doc2.to_dict()
    got["version"] = expected["version"]
    got["name"] = expected["name"]
    assert got == expected

    dt2 = export_to_doclang(doc2, include_version=False)
    _assert_gt(dt2, "roundtrip_list_item_with_inline_reserialized.dclg.xml")


def test_constructed_doc_reserialized():
    """test_deserializer_doclang.py:1697-1705 (sample doc loaded from the
    committed embedded dump instead of the builder fixture)."""
    doc = Doc.from_dict(load_doc_json("doc/constructed_doc.embedded.json.gt"))
    dt = export_to_doclang(doc, include_version=False)
    doc2 = load_from_doclang(dt)
    dt2 = export_to_doclang(doc2, include_version=False)
    _assert_gt(dt2, "constr_doc_reserialized.dclg.xml")


def _mixed_hierarchy_doc() -> Doc:
    """Reference conftest.py:470-552."""
    doc = Doc(name="")
    title = doc.add_title("Title")
    doc.add_text("text", "Some intro", parent=title)
    h1 = doc.add_heading("Foo", level=1, parent=title)
    doc.add_text("text", "Foo stuff", parent=h1)
    h2 = doc.add_heading("Bar", level=2, parent=title)
    doc.add_text("text", "Bar stuff", parent=h2)
    doc.add_text("text", "More stuff")

    h1 = doc.add_heading("", level=1)
    h1_inline = doc.add_inline_group(parent=h1)
    doc.add_text("text", "Rich heading", parent=h1_inline)
    doc.add_text("text", "without", parent=h1_inline, formatting={"italic": True})
    doc.add_text("text", "other children besides the inline", parent=h1_inline)
    doc.add_text("text", "Section content as sibling of the heading.")

    h2 = doc.add_heading("Subheading", level=2)
    doc.add_text("text", "Subsection content.", parent=h2)

    h1 = doc.add_heading("", level=1)
    h1_inline = doc.add_inline_group(parent=h1)
    doc.add_text("text", "Rich heading", parent=h1_inline)
    doc.add_text("text", "with", parent=h1_inline, formatting={"italic": True})
    doc.add_text("text", "other children besides the inline", parent=h1_inline)
    doc.add_text("text", "Section content as child of the heading.", parent=h1)
    doc.add_text("text", "Section content as sibling of the heading.")

    doc.add_heading("Heading", level=1)
    doc.add_text("text", "Bar")
    my_list = doc.add_list_group()
    doc.add_list_item("List item", parent=my_list)
    li2 = doc.add_list_item("List item", parent=my_list)
    my_list2 = doc.add_list_group(parent=li2)
    doc.add_list_item("List item", parent=my_list2)
    doc.add_list_item("List item", parent=my_list2)

    doc.add_heading("Heading", level=2)
    table = doc.add_table(data={"table_cells": [], "num_rows": 4, "num_cols": 2})
    rich_item = doc.add_inline_group(parent=table)
    doc.add_text("text", "text in italic ", parent=rich_item, formatting={"italic": True})
    doc.add_text("text", "text in bold", parent=rich_item, formatting={"bold": True})
    for i in range(4):
        for j in range(2):
            if i == 1 and j == 1:
                cell = _cell(i, j, "", ref={"$ref": rich_item["self_ref"]})
            else:
                cell = _cell(i, j, f"cell {i},{j}")
            doc.add_table_cell(table, cell)

    doc.add_heading("Heading", level=1)
    fr = doc.add_field_region()
    doc.add_text("text", "Some text", parent=fr)
    fi = doc.add_field_item(parent=fr)
    doc.add_text("text", "Some text", parent=fi)
    doc.add_field_key("Key", parent=fi)
    doc.add_field_value("Value", parent=fi)
    return doc


@pytest.mark.parametrize(
    "op,json_gt,dclg_gt",
    [
        (flatten, "flattened.json", "flattened.dclg.xml"),
        (hierarchize, "hierarchized.json", "hierarchized.dclg.xml"),
    ],
    ids=["flatten", "hierarchize"],
)
def test_flatten_hierarchize_gt(op, json_gt, dclg_gt):
    """test_hierarchy.py:30-56."""
    doc = op(_mixed_hierarchy_doc())
    doc.normalize_references()
    expected = load_doc_json(f"doc/{json_gt}")
    got = doc.to_dict()
    got["version"] = expected["version"]
    got["name"] = expected["name"]
    assert got == expected
    _assert_gt(export_to_doclang(doc, include_version=False), dclg_gt)


def test_every_dclg_fixture_is_covered():
    """Completeness gate: every *.dclg.xml under the reference doc corpus is
    referenced by some test module here (literally or via a known dynamic
    pattern) or sits in SKIP_LIST with a reason."""
    base = require_ref_data() / "doc"
    tests_src = "".join(
        p.read_text() for p in Path(__file__).parent.glob("test_doclang*.py")
    )
    # names composed dynamically by parametrized tests
    dynamic = {
        f"{stem}.dclg.xml"
        for stem in re.findall(r'"([\w.]+)"', tests_src)
    }
    missing = []
    for f in sorted(base.glob("*.dclg.xml")):
        if f.name in SKIP_LIST:
            continue
        if f.name in tests_src or f.name in dynamic or f.stem in tests_src:
            continue
        missing.append(f.name)
    assert not missing, f"uncovered DocLang fixtures: {missing}"


def test_text_with_hyperlink():
    """test_serialization_doclang.py:2059-2072."""
    doc = Doc(name="hyperlink")
    doc.add_text("text", "see repository",
                 hyperlink="https://github.com/docling-project/docling")
    _assert_gt(export_to_doclang(doc, include_version=False), "text_with_hyperlink.gt.dclg.xml")


def test_text_with_hyperlink_and_layer():
    """test_serialization_doclang.py:2079-2106: href precedes layer in head."""
    doc = Doc(name="hyperlink_and_layer")
    doc.add_text("page_header", "linked header",
                 hyperlink="https://example.com/doc", content_layer="furniture")
    out = export_to_doclang(doc, include_version=False, add_location=False,
                            layer_mode="auto")
    _assert_gt(out, "text_with_hyperlink_and_layer.gt.dclg.xml")
    assert out.index("<href") < out.index("<layer")
