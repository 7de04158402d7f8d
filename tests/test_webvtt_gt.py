"""Byte-parity of the WebVTT serializer vs reference GT fixtures
(reference test/test_serialization.py:1005-1036)."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.webvtt_out import export_to_webvtt
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, load_gt


def _doc(name: str) -> Doc:
    return Doc.from_dict(load_doc_json(f"doc/{name}"))


@pytest.mark.parametrize("num", [1, 2, 3, 4, 5])
def test_webvtt_examples(num: int):
    doc = _doc(f"webvtt_example_{num:02d}.json")
    actual = export_to_webvtt(doc)
    expected = load_gt(f"doc/webvtt_example_{num:02d}.gt.vtt").rstrip()
    assert actual == expected, f"example {num}"


@pytest.mark.parametrize(
    "src,gt",
    [
        ("2206.01062.yaml", "2206.01062.yaml.vtt"),
        ("constructed_doc.embedded.yaml.gt", "constructed_doc.vtt.gt"),
        ("dummy_doc.yaml", "dummy_doc.yaml.vtt"),
    ],
)
def test_webvtt_full_docs(src: str, gt: str):
    doc = _doc(src)
    assert export_to_webvtt(doc) == load_gt(f"doc/{gt}").rstrip()


def test_webvtt_params():
    """Mirror of reference test_webvtt_params."""
    doc = _doc("webvtt_example_01.json")
    out = export_to_webvtt(doc, omit_hours_if_zero=True)
    assert "00:11.000 --> 00:13.000" in out
    out = export_to_webvtt(doc, omit_voice_end=True)
    assert "</v>" not in out
    both = export_to_webvtt(doc, omit_hours_if_zero=True, omit_voice_end=True)
    assert "00:11.000 --> 00:13.000" in both and "</v>" not in both
    default = export_to_webvtt(doc)
    assert len(both) <= len(default)
