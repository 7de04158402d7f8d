"""WebVTT cue parser pins (reference test_webvtt.py:32-300)."""

from __future__ import annotations

import warnings

import pytest
from pydantic import ValidationError

from docling_core_spark.model.webvtt import (
    WebVTTCueBlock,
    WebVTTCueComponentWithTerminator,
    WebVTTCueInternalText,
    WebVTTCueItalicSpan,
    WebVTTCueLanguageSpan,
    WebVTTCueSpanStartTagAnnotated,
    WebVTTCueTextSpan,
    WebVTTCueTimings,
    WebVTTCueVoiceSpan,
    WebVTTFile,
    WebVTTTimestamp,
)

from .conftest import require_ref_data


def _vtt(name: str) -> str:
    return (require_ref_data() / "webvtt" / name).read_text(encoding="utf-8")


def test_timestamps():
    cases = {
        "00:01:02.345": 62.345,
        "12:34:56.789": 12 * 3600 + 34 * 60 + 56.789,
        "02:34.567": 154.567,
        "00:00:00.000": 0.0,
    }
    for raw, secs in cases.items():
        ts = WebVTTTimestamp(raw=raw)
        assert ts.seconds == pytest.approx(secs)
        assert str(ts) == raw
    for bad in ("00:60:02.345", "00:01:60.345", "00:01:02.1000", "01:02:03",
                "01:02", ":01:02.345", "abc:01:02.345"):
        with pytest.raises(ValidationError):
            WebVTTTimestamp(raw=bad)


def test_cue_timings():
    t = WebVTTCueTimings(
        start=WebVTTTimestamp(raw="00:10.005"), end=WebVTTTimestamp(raw="00:14.007")
    )
    assert str(t) == "00:10.005 --> 00:14.007"
    with pytest.raises(ValidationError, match="greater than start"):
        WebVTTCueTimings(
            start=WebVTTTimestamp(raw="00:10.700"), end=WebVTTTimestamp(raw="00:10.500")
        )
    with pytest.raises(ValidationError, match="required"):
        WebVTTCueTimings(start=WebVTTTimestamp(raw="00:10.500"))  # type: ignore


def test_text_span_validation():
    assert str(WebVTTCueTextSpan(text="ok span")) == "ok span"
    assert WebVTTCueTextSpan(text="Pride &amp; Prejudice").text
    for bad in ("has\nnewline", "has & amp", "An invalid &foo; entity", "has <", ""):
        with pytest.raises(ValidationError):
            WebVTTCueTextSpan(text=bad)


def test_voice_span_str():
    def _voice(annotation, classes=None):
        return WebVTTCueVoiceSpan(
            start_tag=WebVTTCueSpanStartTagAnnotated(
                name="v", annotation=annotation, classes=classes or []
            ),
            internal_text=WebVTTCueInternalText(
                components=[
                    WebVTTCueComponentWithTerminator(
                        component=WebVTTCueTextSpan(text="random text")
                    )
                ]
            ),
        )

    assert str(_voice("speaker", ["loud", "clear"])) == "<v.loud.clear speaker>random text</v>"
    assert str(_voice("speaker")) == "<v speaker>random text</v>"
    with pytest.raises(ValidationError):
        WebVTTCueSpanStartTagAnnotated(name="v", annotation="invalid\nannotation")
    with pytest.raises(ValidationError):
        WebVTTCueSpanStartTagAnnotated(name="v", annotation="a", classes=["x\ny", ""])
    with pytest.raises(ValidationError):
        WebVTTCueInternalText(components=[123, "not a component"])


def test_cueblock_parse_roundtrip():
    raw = "04:02.500 --> 04:05.000\nJ’ai commencé le basket à l'âge de 13, 14 ans\n"  # noqa: RUF001
    block = WebVTTCueBlock.parse(raw)
    assert str(block.timings) == "04:02.500 --> 04:05.000"
    assert len(block.payload) == 1
    assert isinstance(block.payload[0].component, WebVTTCueTextSpan)
    assert str(block) == raw

    raw = ("04:05.001 --> 04:07.800\nSur les <i.foreignphrase><lang en>playground"
           "</lang></i>, ici à Montpellier\n")
    block = WebVTTCueBlock.parse(raw)
    assert len(block.payload) == 3
    italic = block.payload[1].component
    assert isinstance(italic, WebVTTCueItalicSpan)
    lang = italic.internal_text.components[0].component
    assert isinstance(lang, WebVTTCueLanguageSpan)
    assert lang.internal_text.components[0].component.text == "playground"
    assert str(block) == raw


def test_webvtt_file_example_01():
    vtt = WebVTTFile.parse(_vtt("webvtt_example_01.vtt"))
    assert len(vtt) == 13
    block = vtt.cue_blocks[11]
    assert str(block.timings) == "00:32.500 --> 00:33.500"
    voice = block.payload[0].component
    assert isinstance(voice, WebVTTCueVoiceSpan)
    assert voice.start_tag.annotation == "Neil deGrasse Tyson"
    assert not voice.start_tag.classes
    inner = voice.internal_text.components[0].component
    assert isinstance(inner, WebVTTCueItalicSpan)
    assert inner.internal_text.components[0].component.text == "Laughs"


def test_webvtt_file_example_02_reverse_format():
    content = _vtt("webvtt_example_02.vtt")
    vtt = WebVTTFile.parse(content)
    assert len(vtt) == 4
    reverse = "WEBVTT\n\nNOTE Copyright © 2019 World Wide Web Consortium. https://www.w3.org/TR/webvtt1/\n\n"
    reverse += "\n".join(
        block.format(omit_hours_if_zero=True, omit_voice_end=True)
        for block in vtt.cue_blocks
    )
    assert content == reverse.rstrip()


def test_webvtt_file_example_03_identifiers():
    vtt = WebVTTFile.parse(_vtt("webvtt_example_03.vtt"))
    assert len(vtt) == 13
    assert all(block.identifier for block in vtt)
    b0 = vtt.cue_blocks[0]
    assert b0.identifier == "62357a1d-d250-41d5-a1cf-6cc0eeceffcc/15-0"
    assert str(b0.timings) == "00:00:04.963 --> 00:00:08.571"
    assert isinstance(b0.payload[0].component, WebVTTCueVoiceSpan)
    b2 = vtt.cue_blocks[2]
    assert b2.payload[0].component.text == "Good."
    assert not vtt.title


def test_webvtt_file_example_04_title_and_blocks():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        vtt = WebVTTFile.parse(_vtt("webvtt_example_04.vtt"))
    assert len(vtt) == 2
    assert vtt.title == "Danger of Nitrogen"
    block = vtt.cue_blocks[1]
    assert len(block.payload) == 5
    assert str(block) == (
        "00:05.000 --> 00:09.000\n"
        "— It will perforate your stomach.\n"
        "— You could <b.loud>die</b>.\n"
        "<v John>This is true.</v>\n"
    )
