"""WebVTT cue model + parser (reference types/doc/webvtt.py, 700 LoC;
behavior pinned by reference test_webvtt.py and the four
test/data/webvtt/webvtt_example_*.vtt fixtures).

Implements the W3C WebVTT cue-text model: validated timestamps and cue
timings, text spans with entity validation, nested voice/italic/bold/
underline/class/language spans with class lists and annotations, cue blocks
with optional identifiers and settings, and file-level parsing that skips
NOTE/STYLE/REGION blocks and extracts the header title.  ``str()`` of every
node reconstructs its markup; ``WebVTTCueBlock.format`` supports the
``omit_hours_if_zero`` and ``omit_voice_end`` round-trip modes.
"""

from __future__ import annotations

import re
from enum import Enum
from typing import ClassVar, Iterator, List, Optional, Union

from pydantic import BaseModel, Field, field_validator, model_validator

_TS_RE = re.compile(r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")
_BAD_AMP_RE = re.compile(r"&(?!(?:amp|lt|gt|lrm|rlm|nbsp|#\d+|#x[0-9a-fA-F]+);)")
_TAG_RE = re.compile(r"<(/?)([^>]*)>")


class WebVTTLineTerminator(str, Enum):
    """Cue text line terminators."""

    CRLF = "\r\n"
    LF = "\n"
    CR = "\r"


class WebVTTTimestamp(BaseModel):
    """hh:mm:ss.mmm or mm:ss.mmm timestamp; ``raw`` keeps the source form."""

    raw: str

    @field_validator("raw")
    @classmethod
    def _validate(cls, v: str) -> str:
        if not _TS_RE.match(v):
            raise ValueError(f"Invalid WebVTT timestamp: {v!r}")
        return v

    @property
    def seconds(self) -> float:
        h, m, s, ms = _TS_RE.match(self.raw).groups()
        return (int(h) if h else 0) * 3600 + int(m) * 60 + int(s) + int(ms) / 1000

    def format(self, omit_hours_if_zero: bool = False) -> str:
        """Timestamp text, optionally dropping a zero hours component."""
        h = _TS_RE.match(self.raw).group(1)
        if omit_hours_if_zero and h is not None and int(h) == 0:
            return self.raw[len(h) + 1 :]
        return self.raw

    def __str__(self) -> str:
        return self.raw


class WebVTTCueTimings(BaseModel):
    """``start --> end`` cue timings."""

    start: WebVTTTimestamp
    end: WebVTTTimestamp

    @model_validator(mode="after")
    def _order(self) -> "WebVTTCueTimings":
        if self.end.seconds <= self.start.seconds:
            raise ValueError("End timestamp must be greater than start timestamp")
        return self

    def format(self, omit_hours_if_zero: bool = False) -> str:
        return (
            f"{self.start.format(omit_hours_if_zero)} --> "
            f"{self.end.format(omit_hours_if_zero)}"
        )

    def __str__(self) -> str:
        return self.format()


class WebVTTCueTextSpan(BaseModel):
    """Plain cue text: no newlines, no ``<``, ampersands only as entities."""

    text: str

    @field_validator("text")
    @classmethod
    def _validate(cls, v: str) -> str:
        if not v:
            raise ValueError("Cue text span must not be empty")
        if "\n" in v or "\r" in v:
            raise ValueError("Cue text span must not contain line terminators")
        if "<" in v:
            raise ValueError("Cue text span must not contain '<'")
        if _BAD_AMP_RE.search(v):
            raise ValueError("Cue text span contains an invalid ampersand")
        return v

    def __str__(self) -> str:
        return self.text


class WebVTTCueSpanStartTag(BaseModel):
    """``<name.class1.class2>`` span start tag."""

    name: str
    classes: List[str] = []

    @field_validator("classes")
    @classmethod
    def _validate_classes(cls, v: List[str]) -> List[str]:
        for c in v:
            if not c or any(ws in c for ws in (" ", "\t", "\n", "\r", ".")):
                raise ValueError(f"Invalid cue span class: {c!r}")
        return v

    def _tag_body(self) -> str:
        return ".".join([self.name, *self.classes])

    def __str__(self) -> str:
        return f"<{self._tag_body()}>"


class WebVTTCueSpanStartTagAnnotated(WebVTTCueSpanStartTag):
    """Start tag with an annotation (voice speaker, ruby text...)."""

    annotation: str = ""

    @field_validator("annotation")
    @classmethod
    def _validate_annotation(cls, v: str) -> str:
        if "\n" in v or "\r" in v or "-->" in v:
            raise ValueError(f"Invalid cue span annotation: {v!r}")
        return v

    def __str__(self) -> str:
        body = self._tag_body()
        return f"<{body} {self.annotation}>" if self.annotation else f"<{body}>"


class WebVTTCueLanguageSpanStartTag(WebVTTCueSpanStartTagAnnotated):
    """``<lang en>`` start tag; the annotation is the language tag."""

    name: str = "lang"


class WebVTTCueInternalText(BaseModel):
    """Nested component list inside a span."""

    components: List["WebVTTCueComponentWithTerminator"] = []

    def __str__(self) -> str:
        return "".join(str(c) for c in self.components)


class _SpanBase(BaseModel):
    internal_text: WebVTTCueInternalText = Field(default_factory=lambda: WebVTTCueInternalText())

    SPAN_NAME: "ClassVar[str]" = ""

    def __str__(self) -> str:
        return f"{self.start_tag}{self.internal_text}</{self.SPAN_NAME}>"


class WebVTTCueItalicSpan(_SpanBase):
    """``<i>`` span."""

    SPAN_NAME = "i"
    start_tag: WebVTTCueSpanStartTag = WebVTTCueSpanStartTag(name="i")


class WebVTTCueBoldSpan(_SpanBase):
    """``<b>`` span."""

    SPAN_NAME = "b"
    start_tag: WebVTTCueSpanStartTag = WebVTTCueSpanStartTag(name="b")


class WebVTTCueUnderlineSpan(_SpanBase):
    """``<u>`` span."""

    SPAN_NAME = "u"
    start_tag: WebVTTCueSpanStartTag = WebVTTCueSpanStartTag(name="u")


class WebVTTCueClassSpan(_SpanBase):
    """``<c.classname>`` span."""

    SPAN_NAME = "c"
    start_tag: WebVTTCueSpanStartTag = WebVTTCueSpanStartTag(name="c")


class WebVTTCueVoiceSpan(_SpanBase):
    """``<v speaker>`` span."""

    SPAN_NAME = "v"
    start_tag: WebVTTCueSpanStartTagAnnotated


class WebVTTCueLanguageSpan(_SpanBase):
    """``<lang en>`` span."""

    SPAN_NAME = "lang"
    start_tag: WebVTTCueLanguageSpanStartTag


AnyCueComponent = Union[
    WebVTTCueTextSpan,
    WebVTTCueItalicSpan,
    WebVTTCueBoldSpan,
    WebVTTCueUnderlineSpan,
    WebVTTCueClassSpan,
    WebVTTCueVoiceSpan,
    WebVTTCueLanguageSpan,
]


class WebVTTCueComponentWithTerminator(BaseModel):
    """A cue component plus its optional trailing line terminator."""

    component: AnyCueComponent
    terminator: Optional[WebVTTLineTerminator] = None

    def __str__(self) -> str:
        return f"{self.component}{self.terminator.value if self.terminator else ''}"


WebVTTCueInternalText.model_rebuild()

_SPAN_BY_NAME = {
    "i": WebVTTCueItalicSpan,
    "b": WebVTTCueBoldSpan,
    "u": WebVTTCueUnderlineSpan,
    "c": WebVTTCueClassSpan,
}


def _parse_cue_text(text: str) -> List[WebVTTCueComponentWithTerminator]:
    """Tokenize cue text into components; newlines become terminators on the
    preceding component, an implicit terminator closes the block."""
    out: List[WebVTTCueComponentWithTerminator] = []
    # stack of open spans: (span object, component list it collects)
    stack: List[tuple] = []

    def emit(component, terminator=None):
        wrapped = WebVTTCueComponentWithTerminator(
            component=component, terminator=terminator
        )
        if stack:
            stack[-1][1].append(wrapped)
        else:
            out.append(wrapped)

    def set_terminator(term: WebVTTLineTerminator) -> None:
        target = stack[-1][1] if stack else out
        if target and target[-1].terminator is None:
            target[-1].terminator = term

    i = 0
    n = len(text)
    while i < n:
        if text[i] == "<":
            m = _TAG_RE.match(text, i)
            if not m:
                raise ValueError(f"Malformed cue tag at offset {i}")
            closing, body = m.group(1), m.group(2)
            if closing:
                if stack:
                    span, comps = stack.pop()
                    span.internal_text = WebVTTCueInternalText(components=comps)
                    emit(span)
            else:
                name_part, _, annotation = body.partition(" ")
                name, *classes = name_part.split(".")
                if name == "v":
                    span = WebVTTCueVoiceSpan(
                        start_tag=WebVTTCueSpanStartTagAnnotated(
                            name="v", annotation=annotation, classes=classes
                        )
                    )
                elif name == "lang":
                    span = WebVTTCueLanguageSpan(
                        start_tag=WebVTTCueLanguageSpanStartTag(
                            annotation=annotation, classes=classes
                        )
                    )
                elif name in _SPAN_BY_NAME:
                    span = _SPAN_BY_NAME[name](
                        start_tag=WebVTTCueSpanStartTag(name=name, classes=classes)
                    )
                else:
                    raise ValueError(f"Unsupported cue span: {name!r}")
                stack.append((span, []))
            i = m.end()
            continue
        if text[i] in "\r\n":
            if text.startswith("\r\n", i):
                term, step = WebVTTLineTerminator.CRLF, 2
            elif text[i] == "\n":
                term, step = WebVTTLineTerminator.LF, 1
            else:
                term, step = WebVTTLineTerminator.CR, 1
            # a newline inside an open voice span closes it implicitly
            while stack:
                span, comps = stack.pop()
                span.internal_text = WebVTTCueInternalText(components=comps)
                emit(span)
            set_terminator(term)
            i += step
            continue
        nxt = n
        for stop in ("<", "\n", "\r"):
            k = text.find(stop, i)
            if k != -1:
                nxt = min(nxt, k)
        emit(WebVTTCueTextSpan(text=text[i:nxt]))
        i = nxt
    # close any spans left open at end of block
    while stack:
        span, comps = stack.pop()
        span.internal_text = WebVTTCueInternalText(components=comps)
        emit(span)
    set_terminator(WebVTTLineTerminator.LF)
    return out


class WebVTTCueBlock(BaseModel):
    """One cue: optional identifier, timings (+settings), payload."""

    identifier: Optional[str] = None
    timings: WebVTTCueTimings
    settings: str = ""
    payload: List[WebVTTCueComponentWithTerminator] = []

    @classmethod
    def parse(cls, raw: str) -> "WebVTTCueBlock":
        lines = raw.split("\n")
        idx = 0
        identifier = None
        if "-->" not in lines[0] and len(lines) > 1 and "-->" in lines[1]:
            identifier = lines[0].strip()
            idx = 1
        timing_line = lines[idx]
        m = re.match(r"\s*(\S+)\s+-->\s+(\S+)\s*(.*)$", timing_line)
        if not m:
            raise ValueError(f"Missing cue timings in block: {raw!r}")
        timings = WebVTTCueTimings(
            start=WebVTTTimestamp(raw=m.group(1)), end=WebVTTTimestamp(raw=m.group(2))
        )
        settings = m.group(3).strip()
        body = "\n".join(lines[idx + 1 :])
        return cls(
            identifier=identifier,
            timings=timings,
            settings=settings,
            payload=_parse_cue_text(body),
        )

    def format(
        self, omit_hours_if_zero: bool = False, omit_voice_end: bool = False
    ) -> str:
        head = ""
        if self.identifier:
            head += f"{self.identifier}\n"
        head += self.timings.format(omit_hours_if_zero)
        if self.settings:
            head += f" {self.settings}"
        body = "".join(str(c) for c in self.payload)
        if omit_voice_end and self.payload:
            last = self.payload[-1]
            if isinstance(last.component, WebVTTCueVoiceSpan):
                term = last.terminator.value if last.terminator else ""
                suffix = f"</v>{term}"
                if body.endswith(suffix):
                    body = body[: -len(suffix)] + term
        return f"{head}\n{body}"

    def __str__(self) -> str:
        return self.format()


class WebVTTFile(BaseModel):
    """A parsed WebVTT file: header title + cue blocks (NOTE/STYLE/REGION
    blocks are skipped)."""

    title: str = ""
    cue_blocks: List[WebVTTCueBlock] = []

    @classmethod
    def parse(cls, content: str) -> "WebVTTFile":
        normalized = content.replace("\r\n", "\n").replace("\r", "\n")
        blocks = re.split(r"\n{2,}", normalized.strip("\n"))
        if not blocks or not blocks[0].startswith("WEBVTT"):
            raise ValueError("Not a WebVTT file: missing WEBVTT header")
        header = blocks[0].split("\n", 1)[0]
        title = header[len("WEBVTT") :].strip()
        cues: List[WebVTTCueBlock] = []
        for block in blocks[1:]:
            stripped = block.lstrip()
            if stripped.startswith(("NOTE", "STYLE", "REGION")):
                continue
            if "-->" not in block:
                continue
            cues.append(WebVTTCueBlock.parse(block))
        return cls(title=title, cue_blocks=cues)

    def __len__(self) -> int:
        return len(self.cue_blocks)

    def __iter__(self) -> Iterator[WebVTTCueBlock]:  # type: ignore[override]
        return iter(self.cue_blocks)
