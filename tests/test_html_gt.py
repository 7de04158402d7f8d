"""HTML serializer byte-parity vs reference *.gt.html fixtures."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.html_out import export_to_html, latex_to_mathml
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt


def _assert_eq(actual: str, gt_name: str) -> None:
    expected = load_gt(f"doc/{gt_name}").rstrip()
    if actual != expected:
        a, e = actual.splitlines(), expected.splitlines()
        for i, (la, le) in enumerate(zip(a, e)):
            assert la == le, f"line {i + 1}:\n  actual : {la!r}\n  expect : {le!r}"
        assert len(a) == len(e), f"line count {len(a)} vs {len(e)}"
    assert actual == expected


@pytest.mark.parametrize(
    "src,gt,kwargs",
    [
        ("activities.json", "activities.gt.html", {}),
        ("activities.json", "activities_p1.gt.html", dict(page_no=1)),
        ("activities.json", "activities_p2.gt.html", dict(page_no=2)),
        ("2206.01062.yaml", "2206.01062.yaml.html", {}),
        ("barchart.json", "barchart.gt.html", {}),
        ("polymers.json", "polymers.gt.html", {}),
        ("inline_and_formatting.yaml", "inline_and_formatting.gt.html", {}),
        ("constructed_doc.embedded.json.gt", "constructed_doc.placeholder.html.gt", {}),
        (
            "constructed_doc.embedded.json.gt",
            "constructed_doc.embedded.html.gt",
            dict(image_mode="embedded"),
        ),
        (
            "2408.09869_p1.json",
            "2408.09869_p1_split.gt.html",
            dict(image_mode="embedded", split_page_view=True),
        ),
    ],
)
def test_html_gt(src, gt, kwargs):
    doc = Doc.from_dict(load_doc_json(f"doc/{src}"))
    actual = export_to_html(doc, **kwargs)
    _assert_eq(actual, gt)


@pytest.mark.parametrize("orig", [True, False])
def test_html_list_item_markers(orig):
    doc = Doc.from_dict(load_doc_json("doc/constructed_doc.embedded.json.gt"))
    actual = export_to_html(doc, show_original_list_item_marker=orig)
    _assert_eq(actual, f"constructed_orig_{str(orig).lower()}.gt.html")


def test_mini_mathml():
    out = latex_to_mathml("E=mc^2", "inline")
    assert "<msup><mi>c</mi><mn>2</mn></msup>" in out
    assert 'encoding="TeX">E=mc^2</annotation>' in out
    with pytest.raises(ValueError):
        latex_to_mathml(r"\frac{a}{b}", "block")
