"""WebVTT parser robustness: caption files in the wild are malformed.

Deterministic nasty corpus + hypothesis sweep through WebVTTFile.parse:
every input either parses (and the parsed cues re-serialize / convert to a
doc without error) or raises a ValueError-family error — the narrow surface
per-row isolation catches.  Mirrors the html/doclang/doctags fuzz sweeps.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from docling_core_spark.model.webvtt import WebVTTFile

try:  # pydantic validation errors are ValueError subclasses
    from pydantic import ValidationError
except ImportError:  # pragma: no cover
    ValidationError = ValueError

_OK_ERRORS = (ValueError, ValidationError)

NASTY = [
    "",
    "   ",
    "not a vtt file",
    "WEBVTT",
    "WEBVTT\n",
    "WEBVTT - title here",
    "WEBVTT\n\n00:00.000 --> 00:01.000\nhello",
    "WEBVTT\n\n99:99:99.999 --> 00:00:00.000\nbackwards",
    "WEBVTT\n\n00:00:00.000 --> \nmissing end",
    "WEBVTT\n\n--> 00:00:01.000\nmissing start",
    "WEBVTT\n\nnot-a-time --> also-not\ntext",
    "WEBVTT\n\n00:00:00.000-->00:00:01.000\nno spaces",
    "WEBVTT\n\n00:00:00.000 --> 00:00:01.000 align:weird position:banana\ntext",
    "WEBVTT\n\ncue-id-only",
    "WEBVTT\n\nid\n00:00:00.000 --> 00:00:01.000\n<v Speaker>hi</v>",
    "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n<b>unclosed bold",
    "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n</b>stray close</i>",
    "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n<00:00:00.500>mid <00:00:99.999>ts",
    "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n<v.a.b.c Annotated Name>nested <i><b>x</b></i></v>",
    "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n&amp; &lt; &nope;",
    "WEBVTT\n\nNOTE a comment\n\n00:00:00.000 --> 00:00:01.000\nreal",
    "WEBVTT\n\nSTYLE\n::cue { color: red }\n\n00:00:00.000 --> 00:00:01.000\nreal",
    "WEBVTT\n\nREGION\nid:r1\n\n00:00:00.000 --> 00:00:01.000\nreal",
    "WEBVTT\r\n\r\n00:00:00.000 --> 00:00:01.000\r\ncrlf",
    "WEBVTT\n\n" + "\n\n".join(f"00:00:{i:02d}.000 --> 00:00:{i + 1:02d}.000\ncue {i}" for i in range(50)),
    "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n" + "x" * 50_000,
    "﻿WEBVTT\n\n00:00:00.000 --> 00:00:01.000\nbom header",
]


@pytest.mark.parametrize("payload", NASTY, ids=range(len(NASTY)))
def test_nasty_vtt_parses_or_fails_closed(payload):
    try:
        vtt = WebVTTFile.parse(payload)
    except _OK_ERRORS:
        return
    # whatever parsed must re-serialize (str forms) without error
    for cue in vtt:
        assert isinstance(str(cue.timings.start), str)
        assert isinstance(str(cue.timings.end), str)


def _vtt_fragments():
    ts = st.builds(
        lambda h, m, s, ms: f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}",
        st.integers(0, 99), st.integers(0, 99), st.integers(0, 99), st.integers(0, 999),
    )
    cue_line = st.builds(lambda a, b: f"{a} --> {b}", ts, ts)
    text = st.text(alphabet="abc <>/vbi.&;:0123456789\n", max_size=30)
    return st.one_of(cue_line, text, st.just("NOTE x"), st.just("STYLE"))


@settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(_vtt_fragments(), max_size=12))
def test_generated_vtt_soup_fails_closed(fragments):
    payload = "WEBVTT\n\n" + "\n\n".join(fragments)
    try:
        WebVTTFile.parse(payload)
    except _OK_ERRORS:
        pass
