"""Regression tests for malformed/edge-case HTML (round-2 ADVICE findings)."""

from __future__ import annotations

from docling_core_spark.functions.html_parse import parse_html
from docling_core_spark.functions.serializers import export_to_markdown


def _texts(doc):
    return [t["text"] for t in doc.texts]


def test_void_drop_tag_does_not_swallow_rest_of_page():
    """<embed> is void: it must not enter drop mode (no end tag ever comes)."""
    doc = parse_html(b"<p>before</p><embed src=x><p>after</p>")
    assert _texts(doc) == ["before", "after"]


def test_nonvoid_drop_tag_still_drops_its_subtree():
    doc = parse_html(b"<p>before</p><iframe><p>hidden</p></iframe><p>after</p>")
    assert _texts(doc) == ["before", "after"]


def test_void_inline_tag_does_not_leak_formatting():
    """<wbr> is void: pushing it onto the format stack desyncs later pops."""
    doc = parse_html(b"<p><b>bo<wbr>ld</b></p><p>plain text</p>")
    texts = doc.texts
    assert [t["text"] for t in texts] == ["bold", "plain text"]
    fmt = texts[1].get("formatting") or {}
    assert not fmt.get("bold"), "plain paragraph wrongly marked bold"
    fmt0 = texts[0].get("formatting") or {}
    assert fmt0.get("bold"), "bold paragraph lost its formatting"


def test_stray_inline_end_tag_does_not_strip_other_format():
    """</i> without a matching open must not pop an unrelated <b>."""
    doc = parse_html(b"<p><b>bold</i> still bold</b></p>")
    fmt = doc.texts[0].get("formatting") or {}
    assert fmt.get("bold")


def test_markdown_after_embed_unaffected():
    md = export_to_markdown(parse_html(b"<h1>T</h1><embed src=x><p>body</p>"))
    assert "body" in md
