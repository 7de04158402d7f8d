"""DocLang deserializer robustness: untrusted markup fails CLOSED.

The reference treats DocLang input as untrusted (.dclx archives, LLM
output): parse failures raise ValueError-class errors — never segfaults,
hangs, or foreign exception types that would escape a pipeline's per-row
error isolation.  Mirrors tests/test_html_parse_fuzz.py for the XML side:
a deterministic nasty corpus plus a hypothesis sweep; every input either
deserializes to a Doc (whose serializers are then total) or raises a
narrow, catchable error.
"""

from __future__ import annotations

import string

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from docling_core_spark.functions.doclang_load import load_from_doclang

# the error surface a caller must catch for per-row isolation: XML parse
# errors surface as expat ExpatError, semantic/budget violations as
# ValueError — the deterministic corpus triggers ONLY these two (verified),
# so the tuple stays narrow: any broader failure class is a real bug
from xml.parsers.expat import ExpatError

_OK_ERRORS = (ValueError, ExpatError)

NASTY = [
    "",
    " ",
    "<",
    "not xml at all",
    "<doclang>",  # unterminated
    "<doclang></wrong>",
    "<doclang><text></doclang>",  # mis-nested
    "<unknown_root><text>x</text></unknown_root>",
    "<doclang><unknown_tag attr='1'>x</unknown_tag></doclang>",
    "<doclang><text><location value='nope'/>x</text></doclang>",
    "<doclang><picture><location value='0'/><location value='0'/></picture></doclang>",
    "<doclang><otsl><fcel>a<ched>b</otsl></doclang>",
    "<doclang><text>&undefined_entity;</text></doclang>",
    "<doclang><!-- comment only --></doclang>",
    "<doclang><![CDATA[raw]]></doclang>",
    "<doclang>" + "<group>" * 200 + "</group>" * 200 + "</doclang>",  # > depth budget
    "<doclang><page_break/><page_break/><page_break/></doclang>",
    "<?xml version='1.0' encoding='utf-8'?><doclang><text>decl</text></doclang>",
    "<doclang><table><otsl></otsl></table></doclang>",
    "<doclang><key_value_region></key_value_region></doclang>",
]


@pytest.mark.parametrize("payload", NASTY, ids=range(len(NASTY)))
def test_nasty_doclang_parses_or_fails_closed(payload):
    try:
        doc = load_from_doclang(payload)
    except _OK_ERRORS:
        return
    # whatever parsed must serialize totally
    from docling_core_spark.functions.doclang_out import export_to_doclang
    from docling_core_spark.functions.serializers import export_to_markdown

    assert isinstance(export_to_markdown(doc), str)
    assert isinstance(export_to_doclang(doc, pretty_indentation=None), str)
    assert isinstance(doc.to_json(), str)


_TAGS = [
    "doclang", "text", "title", "section_header", "list", "list_item",
    "picture", "table", "otsl", "fcel", "ched", "nl", "group", "caption",
    "code", "formula", "page_break", "location", "marker", "ldiv",
    "key_value_region", "page_header", "page_footer",
]


def _xml_fragments():
    word = st.text(alphabet=string.ascii_letters + string.digits + " <>&'\"/=.-_", max_size=16)
    tag = st.sampled_from(_TAGS)
    open_tag = st.builds(lambda t: f"<{t}>", tag)
    close_tag = st.builds(lambda t: f"</{t}>", tag)
    self_close = st.builds(lambda t, v: f"<{t} value='{v}'/>", tag, st.integers(0, 500))
    return st.one_of(word, open_tag, close_tag, self_close)


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_xml_fragments(), max_size=40))
def test_generated_doclang_soup_fails_closed(fragments):
    payload = "<doclang>" + "".join(fragments) + "</doclang>"
    try:
        doc = load_from_doclang(payload)
    except _OK_ERRORS:
        return
    assert doc.to_json()
