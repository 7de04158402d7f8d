"""Byte-parity of the DocLang serializer vs reference GT fixtures
(reference test/test_serialization_doclang.py)."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.doclang_out import export_to_doclang
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt


def _file_doc(name: str) -> Doc:
    return Doc.from_dict(load_doc_json(f"doc/{name}"))


def _assert_gt(actual: str, gt_name: str):
    expected = load_gt(f"doc/{gt_name}").rstrip()
    assert actual.rstrip() == expected, _first_diff(actual.rstrip(), expected)


def _first_diff(actual: str, expected: str) -> str:
    a, e = actual.splitlines(), expected.splitlines()
    for i, (la, le) in enumerate(zip(a, e)):
        if la != le:
            return f"line {i + 1}:\n  actual : {la!r}\n  expect : {le!r}"
    return f"length: actual {len(a)} vs expected {len(e)} lines"


def test_doclang_v0_v1_v2():
    """Mirror of reference test_doclang (human/indented, content-filtered, minimized)."""
    doc = _file_doc("ddoc_0.json")
    _assert_gt(export_to_doclang(doc, include_version=False), "ddoc_0.v0.gt.dclg.xml")
    _assert_gt(
        export_to_doclang(doc, include_version=False, content_types=frozenset({"table"})),
        "ddoc_0.v1.gt.dclg.xml",
    )
    _assert_gt(
        export_to_doclang(
            doc, include_version=False, pretty_indentation=None, content_types=frozenset({"table"})
        ),
        "ddoc_0.v2.gt.dclg.xml",
    )


def test_doclang_crop_placeholder():
    doc = _file_doc("activities_simplified.yaml")
    out = export_to_doclang(doc, include_version=False, image_mode="placeholder")
    _assert_gt(out, "activities_simplified_cropped_placeholder.dclg.xml")


def _prov(page_no=1, bbox=(1, 2, 3, 4), charspan=(0, 2)):
    l, t, r, b = bbox  # from_tuple((1,2,3,4), BOTTOMLEFT) -> l=1,t=2,r=3,b=4
    return [
        {
            "page_no": page_no,
            "bbox": {"l": l, "t": t, "r": r, "b": b, "coord_origin": "BOTTOMLEFT"},
            "charspan": list(charspan),
        }
    ]


def _add_texts_section(doc: Doc):
    doc.add_text("text", "Simple text")
    inline1 = doc.add_inline_group()
    doc.add_text("text", "Here a code snippet: ", parent=inline1)
    doc.add_code("help()", parent=inline1, code_language="Python")
    doc.add_text("text", " (to be shown)", parent=inline1)


def _add_list_section(doc: Doc):
    doc.add_page(1, 100, 100)
    prov = _prov()
    lg = doc.add_list_group()
    doc.add_list_item("foo", parent=lg)
    doc.add_list_item("bar", parent=lg)

    li = doc.add_list_item("", parent=lg)
    inline = doc.add_inline_group(parent=li)
    doc.add_text("text", "Here a formula: ", parent=inline)
    doc.add_formula("E=mc^2 ", parent=inline)
    doc.add_text("text", "in line", parent=inline)

    li = doc.add_list_item("", parent=lg)
    inline = doc.add_inline_group(parent=li)
    doc.add_text("text", "Here a ", parent=inline)
    doc.add_text("text", "bold", parent=inline, formatting={"bold": True})
    doc.add_text("text", " text", parent=inline)

    li = doc.add_list_item("will contain sublist", parent=lg)
    lg_sub = doc.add_list_group(parent=li)
    doc.add_list_item("sublist item 1", parent=lg_sub)
    doc.add_list_item("sublist item 2", parent=lg_sub)

    li = doc.add_list_item("", parent=lg, prov=prov)
    inline = doc.add_inline_group(parent=li)
    doc.add_text("text", "Here a ", parent=inline)
    doc.add_text(
        "text", "both bold and italicized", parent=inline,
        formatting={"bold": True, "italic": True},
    )
    doc.add_text("text", " text and a sublist:", parent=inline)
    lg_sub = doc.add_list_group(parent=li)
    doc.add_list_item("sublist item a", parent=lg_sub)
    doc.add_list_item("sublist item b", parent=lg_sub)

    doc.add_list_item("final element", parent=lg)


def test_default_mode():
    doc = Doc("test")
    _add_texts_section(doc)
    _add_list_section(doc)
    _assert_gt(export_to_doclang(doc, include_version=False), "default_mode.gt.dclg.xml")


def _wrapping_doc() -> Doc:
    doc = Doc("test")
    doc.add_page(1, 100, 100)
    prov = _prov()
    doc.add_text("text", "simple")
    doc.add_text("text", "  leading")
    doc.add_text("text", "trailing  ")
    doc.add_text("text", "< special")
    doc.add_text("text", "  leading and < special")
    doc.add_text("text", "w/prov simple", prov=prov)
    doc.add_text("text", "  w/prov leading", prov=_prov())
    doc.add_text("text", "w/prov trailing  ", prov=_prov())
    doc.add_text("text", "w/prov < special", prov=_prov())
    doc.add_text("text", "  w/prov leading and < special", prov=_prov())
    return doc


@pytest.mark.parametrize(
    "mode,gt",
    [("auto", "wrapping_when_needed.gt.dclg.xml"), ("always", "wrapping_always.gt.dclg.xml")],
)
def test_content_wrapping_modes(mode, gt):
    out = export_to_doclang(_wrapping_doc(), include_version=False, content_wrapping_mode=mode)
    _assert_gt(out, gt)


def test_inline_group():
    doc = Doc("test")
    doc.add_page(1, 100, 100)
    parent_txt = doc.add_text("text", "", prov=_prov())
    gr = doc.add_inline_group(parent=parent_txt)
    doc.add_text("text", "One", parent=gr)
    doc.add_text("text", "Two", parent=gr, formatting={"bold": True})
    doc.add_text("text", "Three", parent=gr)

    ul = doc.add_list_group()
    doc.add_list_item("Item 1", parent=ul)
    li2 = doc.add_list_item("", parent=ul)
    gr2 = doc.add_inline_group(parent=li2)
    doc.add_text("text", "Four", parent=gr2)
    doc.add_text("text", "Five", parent=gr2, formatting={"bold": True})
    doc.add_text("text", "Six", parent=gr2)
    _assert_gt(export_to_doclang(doc, include_version=False), "inline_group.gt.dclg.xml")


def test_mini_inline():
    doc = Doc("test")
    ul = doc.add_list_group()
    li = doc.add_list_item("", parent=ul)
    inl = doc.add_inline_group(parent=li)
    doc.add_text("text", "foo", parent=inl)
    doc.add_text("text", "bar", parent=inl, formatting={"bold": True})
    _assert_gt(export_to_doclang(doc, include_version=False), "mini_inline.gt.dclg.xml")


def test_vlm_mode():
    doc = Doc("test")
    _add_texts_section(doc)
    _add_list_section(doc)
    cap = doc.add_text("caption", "Picture\nCaption")
    pic = doc.add_picture(caption=cap)
    pic["image"] = {
        "mimetype": "image/png",
        "uri": (
            "data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAAAIAAAACCAIAAAD91JpzAAAAC0lEQVR4nGNgQAYA"
            "AA4AAamRc7EAAAAASUVORK5CYII="
        ),
        "dpi": 300,
        "size": {"width": 100, "height": 100},
    }
    doc.add_code("0 == 0")
    cells = []
    for i, row in enumerate((("A", "B"), ("C", "D"))):
        for j, text in enumerate(row):
            cells.append(
                {
                    "start_row_offset_idx": i,
                    "end_row_offset_idx": i + 1,
                    "start_col_offset_idx": j,
                    "end_col_offset_idx": j + 1,
                    "text": text,
                    "bbox": {
                        "l": 10 + j * 40,
                        "t": 70 - i * 8,
                        "r": 45 + j * 40,
                        "b": 78 - i * 8,
                        "coord_origin": "BOTTOMLEFT",
                    },
                }
            )
    doc.add_table(
        {"num_rows": 2, "num_cols": 2, "table_cells": cells},
        prov=_prov(bbox=(10, 60, 90, 90), charspan=(0, 0)),
    )
    out = export_to_doclang(
        doc,
        add_table_cell_location=True,
        pretty_indentation=None,
        escape_mode="always",
        content_wrapping_mode="always",
        traverse_pictures=True,
        include_namespace=False,
        include_version=False,
        use_virtual_text=True,
        label_mode="always",
        interpret_code_unknown_as_other=True,
    )
    _assert_gt(out, "vlm_mode.gt.dclg.xml")


def _row_cells(rows, headers_first_row=False):
    cells = []
    for i, row in enumerate(rows):
        for j, text in enumerate(row):
            cells.append(
                {
                    "text": text,
                    "start_row_offset_idx": i,
                    "end_row_offset_idx": i + 1,
                    "start_col_offset_idx": j,
                    "end_col_offset_idx": j + 1,
                    "column_header": headers_first_row and i == 0,
                }
            )
    return cells


def test_checkboxes():
    doc = Doc("")
    doc.add_text("checkbox_unselected", "TODO")
    doc.add_text("checkbox_selected", "DONE")
    _assert_gt(export_to_doclang(doc, include_version=False), "checkboxes.out.dclg.xml")


def test_document_index():
    doc = Doc("test")
    rows1 = [["Header 1", "Header 2"], ["Data 1", "Data 2"]]
    doc.add_table({"num_rows": 2, "num_cols": 2, "table_cells": _row_cells(rows1, True)})
    rows2 = [["Index 1", "Page 1"], ["Index 2", "Page 2"]]
    doc.add_table(
        {"num_rows": 2, "num_cols": 2, "table_cells": _row_cells(rows2)},
        label="document_index",
    )
    _assert_gt(export_to_doclang(doc, include_version=False), "document_index.gt.dclg.xml")


def test_handwritten_text():
    doc = Doc("")
    doc.add_page(1, 100, 100)
    prov = _prov()
    doc.add_text("handwritten_text", "My hand-written note")
    doc.add_text("handwritten_text", "My hand-written note (with prov)", prov=_prov())
    inl_text = doc.add_text("text", "", prov=_prov())
    inline = doc.add_inline_group(parent=inl_text)
    doc.add_text("text", "Check ", parent=inline)
    doc.add_text("handwritten_text", "out", parent=inline)
    doc.add_text("text", " these", parent=inline)
    doc.add_text("handwritten_text", " hand-written spans", parent=inline)
    _assert_gt(export_to_doclang(doc, include_version=False), "handwritten_text.gt.dclg.xml")


def test_suppress_empty_elements():
    suppress = dict(
        suppress_empty_elements=True, add_location=False, content_types=frozenset()
    )
    doc = Doc("test")
    doc.add_text("text", "")
    assert "<text" not in export_to_doclang(doc, include_version=False, **suppress)

    doc2 = Doc("test")
    doc2.add_text("text", "")
    out = export_to_doclang(
        doc2, include_version=False, add_location=False, content_types=frozenset()
    )
    assert "<text></text>" in out

    doc3 = Doc("test")
    doc3.add_heading("", level=2)
    assert "<heading" not in export_to_doclang(doc3, include_version=False, **suppress)

    doc4 = Doc("test")
    doc4.add_picture()
    assert "<picture" not in export_to_doclang(doc4, include_version=False, **suppress)

    doc5 = Doc("test")
    doc5.add_picture()
    out5 = export_to_doclang(
        doc5, include_version=False, add_location=False, content_types=frozenset()
    )
    assert "<picture></picture>" in out5 and "<group" not in out5


def _sample_doc() -> Doc:
    """The committed embedded-yaml form of the reference's constructed
    sample_doc fixture (structurally identical; verified by GT parity)."""
    return _file_doc("constructed_doc.embedded.yaml.gt")


def _escape_test_doc() -> Doc:
    doc = _sample_doc()
    doc.add_text("text", "Simple text")
    doc.add_text("text", "    4 leading spaces, 1 trailing ")
    doc.add_text("text", "Some 'single' quotes")
    doc.add_text("text", 'Some "double" quotes')
    t = doc.add_text("text", "An ampersand: &")
    t["meta"] = {"summary": {"text": "Summary with <tags> & ampersands"}}
    pic = doc.add_picture()
    pic["meta"] = {"description": {"text": "Description content"}}
    doc.add_code("0 == 0")
    doc.add_code(" 1 leading space, 4 trailing    ")
    doc.add_code("0 < 1")
    doc.add_code("42 == 42", code_language="Python")
    doc.add_code("42 < 1337", code_language="Python")
    rows = [["Foo", "Bar"], ["Header & Title", "Value > 100"],
            ["<script>", "A & B"], ["Only", "<second>"]]
    doc.add_table({"num_rows": 4, "num_cols": 2, "table_cells": _row_cells(rows)})
    doc.add_text("text", "0 < 1")
    doc.add_text("text", "0 < 42", formatting={"bold": True, "italic": True})
    return doc


@pytest.mark.parametrize(
    "mode,gt", [("always", "cdata_always.gt.dclg.xml"), ("auto", "cdata_when_needed.gt.dclg.xml")]
)
def test_cdata_modes(mode, gt):
    out = export_to_doclang(
        _escape_test_doc(), include_version=False, escape_mode=mode, image_mode="embedded"
    )
    _assert_gt(out, gt)


def _content_filtering_doc() -> Doc:
    doc = _sample_doc()
    doc.add_page(1, 100, 100)
    prov = _prov()
    pic = doc.add_picture(caption=doc.add_text("caption", "Picture Caption"))
    pic["prov"] = _prov()
    pic["meta"] = {
        "summary": {"text": "Picture Summary"},
        "description": {"text": "Picture Description"},
    }
    chart = doc.add_picture(caption=doc.add_text("caption", "Picture Caption"))
    chart["prov"] = _prov()
    chart["meta"] = {
        "summary": {"text": "Picture Summary"},
        "description": {"text": "Picture Description"},
        "classification": {"predictions": [{"class_name": "pie_chart", "confidence": 1.0}]},
        "tabular_chart": {
            "title": "Chart Title",
            "chart_data": {
                "num_rows": 2,
                "num_cols": 2,
                "table_cells": _row_cells([["Foo", "Bar"], ["One", "Two"]]),
            },
        },
    }
    doc.add_code("0 == 0")
    doc.add_code("with location", prov=_prov())
    return doc


ALL_CONTENT = frozenset(
    {"ref_caption", "ref_footnote", "text_code", "text_formula", "text_other",
     "table", "chart", "table_cell", "picture", "chemistry"}
)


@pytest.mark.parametrize(
    "types,gt",
    [
        (ALL_CONTENT, "content_all.gt.dclg.xml"),
        (frozenset(), "content_none.gt.dclg.xml"),
        (frozenset({"picture", "table", "table_cell", "ref_caption", "text_code"}),
         "content_specific.gt.dclg.xml"),
        (ALL_CONTENT - {"table", "text_code"}, "content_block_specific.gt.dclg.xml"),
    ],
)
def test_content_type_filtering(types, gt):
    out = export_to_doclang(
        _content_filtering_doc(), include_version=False, content_types=types,
        image_mode="embedded",
    )
    _assert_gt(out, gt)
