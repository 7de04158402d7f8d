"""DocTags serializer byte-parity vs reference GT .dt fixtures."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.doctags import export_to_doctags
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt


def _assert_eq(actual: str, gt_name: str) -> None:
    # reference verify() rstrips GT and normalizes quote escaping for .dt
    expected = load_gt(f"doc/{gt_name}").rstrip()
    norm = lambda s: s.replace("&quot;", '"').replace("&#34;", '"')  # noqa: E731
    actual, expected = norm(actual), norm(expected)
    if actual != expected:
        a, e = actual.splitlines(), expected.splitlines()
        for i, (la, le) in enumerate(zip(a, e)):
            assert la == le, f"line {i + 1}:\n  actual : {la!r}\n  expect : {le!r}"
        assert len(a) == len(e), f"line count {len(a)} vs {len(e)}"
    assert actual == expected


@pytest.mark.parametrize(
    "src,gt,kwargs",
    [
        ("2206.01062.yaml", "2206.01062.yaml.dt", {}),
        ("2206.01062.yaml", "2206.01062.yaml.min.dt", dict(minified=True)),
        ("2206.01062.yaml", "2206.01062.yaml.pages.dt", dict(pages={1, 2})),
        ("constructed_doc.embedded.json.gt", "constructed_doc.dt.gt", {}),
    ],
)
def test_doctags_gt(src, gt, kwargs):
    doc = Doc.from_dict(load_doc_json(f"doc/{src}"))
    actual = export_to_doctags(doc, **kwargs)
    _assert_eq(actual, gt)
