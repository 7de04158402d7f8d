"""Property-based robustness tests (hypothesis).

The 10^12-row contract: parse_html + every serializer must be total
functions over arbitrary byte garbage, and deterministic.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from docling_core_spark.functions.chunkers import HybridChunker, RegexTokenizer, hierarchical_chunks
from docling_core_spark.functions.doctags import export_to_doctags
from docling_core_spark.functions.doctags_load import load_from_doctags
from docling_core_spark.functions.html_out import export_to_html
from docling_core_spark.functions.html_parse import parse_html
from docling_core_spark.functions.serializers import export_to_markdown, export_to_text

_TAGS = ["p", "b", "i", "h1", "h2", "ul", "li", "ol", "table", "tr", "td", "th",
         "pre", "figure", "img", "figcaption", "nav", "div", "a", "caption", "blockquote"]

_html_fragments = st.lists(
    st.one_of(
        st.text(max_size=40),
        st.sampled_from([f"<{t}>" for t in _TAGS] + [f"</{t}>" for t in _TAGS]),
        st.sampled_from(["<a href='x'>", "<td colspan='2'>", "<td rowspan='3'>", "&amp;", "&eacute;", "<!--c-->", "<![CDATA[x]]>"]),
    ),
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(_html_fragments)
def test_parse_and_serialize_total(fragments):
    html = "".join(fragments)
    doc = parse_html(html)
    md = export_to_markdown(doc)
    txt = export_to_text(doc)
    ht = export_to_html(doc)
    dt = export_to_doctags(doc)
    assert isinstance(md, str) and isinstance(txt, str) and isinstance(ht, str) and isinstance(dt, str)
    # determinism
    assert export_to_markdown(parse_html(html)) == md
    # chunkers are total too
    list(hierarchical_chunks(doc))
    HybridChunker(tokenizer=RegexTokenizer(32)).chunk(doc)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_parse_arbitrary_bytes(data):
    doc = parse_html(data)
    assert export_to_markdown(doc) == export_to_markdown(parse_html(data))


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=300))
def test_doctags_load_total(text):
    doc = load_from_doctags(f"<doctag>{text}</doctag>")
    assert isinstance(export_to_markdown(doc), str)
