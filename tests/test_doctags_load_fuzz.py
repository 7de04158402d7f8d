"""DocTags loader robustness: model-emitted markup is untrusted.

DocTags is the format VLMs emit — truncated generations, unbalanced tags,
garbage loc tokens, and malformed OTSL are the NORM at inference time, not
the exception.  Mirrors the html/doclang fuzz sweeps: a deterministic nasty
corpus plus a hypothesis tag-soup sweep; every input must either load into
a Doc whose serializers are total, or raise a narrow catchable error.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from docling_core_spark.functions.doctags_load import load_from_doctags

_OK_ERRORS = (ValueError,)

NASTY = [
    "",
    "   ",
    "<doctag>",
    "<doctag></doctag>",
    "<doctag><text>unclosed",
    "<doctag><text><loc_10><loc_20><loc_30><loc_40>hello</text></doctag>",
    "<doctag><text><loc_999><loc_999><loc_999><loc_999>big locs</text></doctag>",
    "<doctag><text><loc_10>too few locs</text></doctag>",
    "<doctag><loc_1><loc_2><loc_3><loc_4></doctag>",  # locs with no item
    "<doctag><section_header_level_1>h</section_header_level_1></doctag>",
    "<doctag><section_header_level_99>weird level</section_header_level_99></doctag>",
    "<doctag><otsl><fcel>a<ecel><nl></otsl></doctag>",
    "<doctag><otsl><fcel>only<nl><fcel>jag<fcel>ged<nl></otsl></doctag>",
    "<doctag><otsl>garbage no cells</otsl></doctag>",
    "<doctag><otsl><lcel><ucel><xcel><nl></otsl></doctag>",  # spans with no anchor
    "<doctag><picture><loc_1><loc_2><loc_3><loc_4><other></picture></doctag>",
    "<doctag><unordered_list><list_item>a</list_item></unordered_list></doctag>",
    "<doctag><unordered_list></unordered_list></doctag>",
    "<doctag><unordered_list><unordered_list><list_item>deep</list_item></unordered_list></unordered_list></doctag>",
    "<doctag><code><_Python_>print(1)</code></doctag>",
    "<doctag><code><_NotALanguage_>x</code></doctag>",
    "<doctag><formula>\\frac{1}{2}</formula></doctag>",
    "<doctag><chart><loc_1><loc_2><loc_3><loc_4></chart></doctag>",
    "<doctag><key_value_region><loc_1><loc_2><loc_3><loc_4></key_value_region></doctag>",
    "<doctag><page_break></doctag>",
    "<doctag><page_break><page_break><page_break></doctag>",
    "<not_doctag>free text</not_doctag>",
    "just plain text no tags",
    "<doctag>" + "<text>t</text>" * 500 + "</doctag>",
    "<doctag><text>" + "x" * 100000 + "</text></doctag>",
    "<doctag><title>t</title><text>\x00\x01 control</text></doctag>",
]


def _serializers_total(doc) -> None:
    from docling_core_spark.functions.doctags import export_to_doctags
    from docling_core_spark.functions.serializers import export_to_markdown

    assert isinstance(export_to_markdown(doc), str)
    assert isinstance(export_to_doctags(doc), str)
    assert isinstance(doc.to_json(), str)


@pytest.mark.parametrize("payload", NASTY, ids=range(len(NASTY)))
def test_nasty_doctags_loads_or_fails_closed(payload):
    try:
        doc = load_from_doctags(payload)
    except _OK_ERRORS:
        return
    _serializers_total(doc)


_TAGS = [
    "doctag", "text", "title", "section_header_level_1", "list_item",
    "unordered_list", "ordered_list", "picture", "otsl", "fcel", "ched",
    "rhed", "ecel", "lcel", "ucel", "nl", "caption", "code", "formula",
    "footnote", "page_header", "page_footer", "page_break", "chart",
    "key_value_region", "checkbox_selected", "smiles", "paragraph",
]


def _dt_fragments():
    word = st.text(
        alphabet="abcdefghijklmnop <>_/&0123456789", max_size=12
    )
    tag = st.sampled_from(_TAGS)
    open_tag = st.builds(lambda t: f"<{t}>", tag)
    close_tag = st.builds(lambda t: f"</{t}>", tag)
    loc = st.builds(lambda v: f"<loc_{v}>", st.integers(-5, 600))
    return st.one_of(word, open_tag, close_tag, loc)


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_dt_fragments(), max_size=40))
def test_generated_doctags_soup_fails_closed(fragments):
    payload = "<doctag>" + "".join(fragments) + "</doctag>"
    try:
        doc = load_from_doctags(payload)
    except _OK_ERRORS:
        return
    assert doc.to_json()
