"""Byte-parity of the markdown/plain-text serializers vs reference GT files.

Each case mirrors one reference test (test/test_serialization.py) — same input
doc JSON, same params, compared byte-for-byte against the committed GT file of
docling-core itself.
"""

from __future__ import annotations

import pytest

from docling_core_spark.functions.serializers import (
    DocSerializer,
    MarkdownParams,
    export_to_markdown,
    export_to_text,
)
from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt

LABELS_NO_PICTURE = M.DOCUMENT_TOKENS_EXPORT_LABELS - {M.PICTURE}


def _doc(name: str) -> Doc:
    return Doc.from_dict(load_doc_json(f"doc/{name}"))


def _assert_eq(actual: str, gt_name: str) -> None:
    # GT files carry one trailing newline added at generation time; the
    # reference's own verify() rstrips it (test_serialization.py:51-69).
    expected = load_gt(f"doc/{gt_name}").rstrip()
    assert actual == expected, _first_diff(actual, expected)


def _first_diff(actual: str, expected: str) -> str:
    a, e = actual.splitlines(), expected.splitlines()
    for i, (la, le) in enumerate(zip(a, e)):
        if la != le:
            return f"line {i + 1}:\n  actual : {la!r}\n  expect : {le!r}"
    return f"length mismatch: actual {len(a)} lines vs expected {len(e)} lines"


@pytest.mark.parametrize(
    "src,gt,params",
    [
        (
            "activities.json",
            "activities.gt.md",
            dict(page_break_placeholder="<!-- page break -->", labels=LABELS_NO_PICTURE),
        ),
        (
            "activities.json",
            "activities_pb_none.gt.md",
            dict(page_break_placeholder=None, labels=LABELS_NO_PICTURE),
        ),
        (
            "activities.json",
            "activities_pb_empty.gt.md",
            dict(page_break_placeholder="", labels=LABELS_NO_PICTURE),
        ),
        (
            "activities.json",
            "activities_pb_non_empty.gt.md",
            dict(page_break_placeholder="<!-- page-break -->", labels=LABELS_NO_PICTURE),
        ),
        (
            "activities.json",
            "activities_p2.gt.md",
            dict(page_break_placeholder=None, pages={2}),
        ),
        (
            "checkboxes.json",
            "checkboxes.gt.md",
            dict(page_break_placeholder="<!-- page break -->", labels=LABELS_NO_PICTURE),
        ),
    ],
)
def test_markdown_serializer_params_gt(src, gt, params):
    doc = _doc(src)
    p = MarkdownParams(**{**params, "labels": frozenset(params.get("labels", M.DOCUMENT_TOKENS_EXPORT_LABELS))})
    actual = DocSerializer(doc, p).serialize().text
    _assert_eq(actual, gt)


@pytest.mark.parametrize(
    "src,gt,params",
    [
        ("barchart.json", "barchart.gt.md", {}),
        ("inline_and_formatting.yaml", "inline_and_formatting.gt.md", {}),
        ("polymers.json", "polymers.gt.md", {}),
        ("2206.01062.yaml", "2206.01062.yaml.md", {}),
        (
            "2206.01062.yaml",
            "2206.01062.yaml.paged.md",
            dict(page_break_placeholder="<!-- page break -->"),
        ),
    ],
)
def test_markdown_more_gt(src, gt, params):
    doc = _doc(src)
    if "labels" in params:
        params = {**params, "labels": frozenset(params["labels"])}
    actual = DocSerializer(doc, MarkdownParams(**params)).serialize().text
    _assert_eq(actual, gt)


@pytest.mark.parametrize(
    "gt,mode",
    [
        ("constructed_doc.placeholder.md.gt", "placeholder"),
        ("constructed_doc.embedded.md.gt", "embedded"),
    ],
)
def test_markdown_constructed_doc(gt, mode):
    doc = _doc("constructed_doc.embedded.json.gt")
    actual = export_to_markdown(doc, image_mode=mode)
    _assert_eq(actual, gt)


@pytest.mark.parametrize("mode", ["never", "always", "auto"])
@pytest.mark.parametrize("valid", [False, True])
def test_md_list_item_marker_matrix(mode, valid):
    doc = _doc("constructed_doc.embedded.json.gt")
    p = MarkdownParams(orig_list_item_marker_mode=mode, ensure_valid_list_item_marker=valid)
    actual = DocSerializer(doc, p).serialize().text
    _assert_eq(actual, f"constructed_mode_{mode}_valid_{str(valid).lower()}.gt.md")


def test_md_compact_table_helper():
    padded = (
        "| item   | qty   | description           |\n"
        "| ------ | ----: | :-------------------: |\n"
        "| spam   | 42    | A canned meat product |\n"
        "| eggs   | 451   | Fresh farm eggs       |\n"
        "| bacon  | 0     | Out of stock          |"
    )
    expected = (
        "| item | qty | description |\n"
        "| - | -: | :-: |\n"
        "| spam | 42 | A canned meat product |\n"
        "| eggs | 451 | Fresh farm eggs |\n"
        "| bacon | 0 | Out of stock |"
    )
    assert DocSerializer._compact_table(padded) == expected


def test_md_numeric_precision_preserved():
    doc = Doc(name="Numeric Precision Test")
    vals = ["3.14159265358979", "123456789.123456789", "0.000000123456"]
    cells = [
        dict(start_row_offset_idx=0, end_row_offset_idx=1, start_col_offset_idx=j,
             end_col_offset_idx=j + 1, text=v)
        for j, v in enumerate(vals)
    ]
    doc.add_table(data=dict(num_rows=1, num_cols=3, table_cells=cells))
    md = export_to_markdown(doc)
    for v in vals:
        assert v in md  # no tabulate numparse truncation


def test_md_traverse_pictures():
    doc = Doc(name="Test Document")
    doc.add_text("paragraph", "Text before picture")
    pic = doc.add_picture()
    inner = doc.add_text("paragraph", "Text inside picture")
    # re-wire inner under the picture
    doc.body["children"] = [r for r in doc.body["children"] if r["$ref"] != inner["self_ref"]]
    inner["parent"] = {"$ref": pic["self_ref"]}
    pic["children"].append({"$ref": inner["self_ref"]})
    doc.add_text("paragraph", "Text after picture")

    no_t = export_to_markdown(doc, traverse_pictures=False)
    assert "Text inside picture" not in no_t and "<!-- image -->" in no_t
    with_t = export_to_markdown(doc, traverse_pictures=True)
    assert "Text inside picture" in with_t and "<!-- image -->" in with_t


def test_md_single_row_table():
    doc = Doc(name="")
    cells = []
    for col_idx, word in enumerate(["foo", "bar"]):
        cells.append(
            dict(
                start_row_offset_idx=0,
                end_row_offset_idx=1,
                start_col_offset_idx=col_idx,
                end_col_offset_idx=col_idx + 1,
                text=word,
            )
        )
    doc.add_table(data=dict(num_rows=1, num_cols=2, table_cells=cells))
    actual = export_to_markdown(doc)
    _assert_eq(actual, "single_row_table.gt.md")


def test_md_pipe_in_table():
    doc = Doc(name="Pipe in Table")
    doc.add_table(
        data=dict(
            num_rows=1,
            num_cols=1,
            table_cells=[
                dict(
                    start_row_offset_idx=0,
                    end_row_offset_idx=1,
                    start_col_offset_idx=0,
                    end_col_offset_idx=1,
                    text="Fruits | Veggies",
                )
            ],
        )
    )
    assert export_to_markdown(doc) == "| Fruits &#124; Veggies   |\n|-------------------------|"


def test_text_export_activities():
    doc = _doc("activities.json")
    actual = export_to_text(doc)
    _assert_eq(actual, "activities.gt.txt")


def test_markdown_excel_sheet_headings():
    from docling_core_spark.functions.serializers import export_to_markdown_excel

    d = Doc(name="wb")
    sheet = d.add_group(label="sheet", name="Sheet1")
    d.add_text("text", "cell data", parent=sheet)
    d.add_group(label="sheet", name="Empty Sheet")
    assert export_to_markdown_excel(d) == "## Sheet1\n\ncell data\n\n## Empty Sheet"
    assert export_to_markdown(d) == "cell data"
