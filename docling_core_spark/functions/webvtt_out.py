"""WebVTT serializer (P6).

Byte-parity target: the reference's WebVTT output
(docling-core transforms/serializer/webvtt.py:344-523 + types/doc/webvtt.py,
GT fixtures test/data/doc/webvtt_example_0*.gt.vtt).

Behavioral spec distilled from the reference:

- Only body-layer text items carrying a ``source`` entry of kind "track"
  become cues; a title item sets the file title ("WEBVTT <title>").
- Per-item formatting wraps innermost-to-outermost: bold, italic, underline
  (common.py post_process order), then the voice span ``<v Name>..</v>``.
- Inline groups concatenate their children's formatted texts, then
  iteratively merge redundant adjacent tag pairs (``</i><i>`` with equal
  classes/annotation merges keeping the whitespace; ``</t><x><t>`` drops the
  redundant close/open around a foreign tag).
- Consecutive parts with the same identifier AND identical start/end timings
  merge into one multi-line cue (joined with LF, pairs re-merged).
- Each finished cue text is round-tripped through a cue parser/renderer that
  normalizes it (appends a missing ``</v>``, strips annotation whitespace,
  drops empty text lines).
- File layout: ``WEBVTT[ title]`` then one blank line before each cue block;
  cue block = [identifier LF] timings LF payload LF; trailing newlines
  stripped; timestamps always HH:MM:SS.mmm unless omit_hours_if_zero.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc

_TAG_RE = re.compile(
    r"<(?P<end>/?)"
    r"(?P<tag>i|b|c|u|v|lang)"
    r"(?P<cls>(?:\.[^\t\n\r &<>.]+)*)"
    r"(?:[ \t](?P<anno>[^\n\r&>]*))?>"
)

# one redundant </t>…<t> pair, same tag directly adjacent (whitespace kept)
_PAIR_ADJACENT = re.compile(
    r"<([bciuv]|lang)((?:\.\w+)*)(?:\s+([^>]+))?>"
    r"((?:(?!</\1>).)*?)"
    r"</\1>"
    r"(\s*)"
    r"<\1((?:\.\w+)*)(?:\s+([^>]+))?>"
)
# one redundant </t><other><t> sandwich around a foreign tag
_PAIR_SANDWICH = re.compile(r"</([bciuv]|lang)>(<[^>]+>)<\1(?:\.\w+)*(?:\s+[^>]+)?>")


def _merge_pair_pass(text: str) -> str:
    def adjacent(m: re.Match) -> str:
        if (m.group(2) or "") == (m.group(6) or "") and (m.group(3) or "") == (m.group(7) or ""):
            anno = m.group(3) or ""
            return f"<{m.group(1)}{m.group(2) or ''}{' ' + anno if anno else ''}>{m.group(4)}{m.group(5)}"
        return m.group(0)

    out = _PAIR_ADJACENT.sub(adjacent, text)
    return _PAIR_SANDWICH.sub(lambda m: m.group(2), out)


def merge_tag_pairs(text: str) -> str:
    """Iterate the pair merges to a fixed point."""
    prev: Optional[str] = None
    while prev != text:
        prev = text
        text = _merge_pair_pass(text)
    return text


def _hms_millis(seconds: float) -> tuple[int, int, int, int]:
    """Timestamp components on the millisecond grid.

    The reference computes millis = round(frac*1000) independently of the
    integer part; a time within 0.5 ms below a whole second rounds millis to
    1000 and the reference's strict re-parse then rejects the cue.  Carry the
    overflow instead (59.9996 -> 00:01:00.000) — valid inputs are unchanged.
    """
    total_ms = round(seconds * 1000)
    hours, rem = divmod(total_ms, 3_600_000)
    minutes, rem = divmod(rem, 60_000)
    secs, millis = divmod(rem, 1000)
    return int(hours), int(minutes), int(secs), int(millis)


def format_timestamp(seconds: float, omit_hours_if_zero: bool = False) -> str:
    hours, minutes, secs, millis = _hms_millis(seconds)
    if omit_hours_if_zero and hours == 0:
        return f"{minutes:02d}:{secs:02d}.{millis:03d}"
    return f"{hours:02d}:{minutes:02d}:{secs:02d}.{millis:03d}"


def timestamp_seconds(seconds: float) -> float:
    """The reference's from_seconds->seconds round trip (millisecond grid)."""
    hours, minutes, secs, millis = _hms_millis(seconds)
    return hours * 3600 + minutes * 60 + secs + millis / 1000.0


# --- cue text normalization (parse -> render round trip) --------------------


def _render_text_lines(text: str) -> Iterator[str]:
    """Text chunk -> rendered line components (empty lines dropped, LF kept
    on every line but an unterminated last one)."""
    lines = text.split("\n")
    ends_lf = text.endswith("\n")
    for idx, line in enumerate(lines):
        if not line:
            continue
        terminator = "\n" if idx < len(lines) - 1 or ends_lf else ""
        yield line + terminator


def _normalize_cue_text(cue_text: str) -> tuple[list[str], bool]:
    """Parse the cue payload tags and re-render normalized components.

    Returns (components, single_voice) where components are rendered strings
    and single_voice marks a payload that is exactly one voice span (the
    omit_voice_end target).
    """
    for tag in ("v",):
        if cue_text.startswith(f"<{tag}") and f"</{tag}>" not in cue_text:
            cue_text += f"</{tag}>"
            break

    # stack of open spans; each level collects rendered component strings
    stack: list[list[str]] = [[]]
    open_tags: list[dict] = []
    pos = 0
    for m in _TAG_RE.finditer(cue_text):
        if m.start() > pos:
            stack[-1].extend(_render_text_lines(cue_text[pos : m.start()]))
        tag = m.group("tag")
        if not m.group("end"):
            open_tags.append(
                {"tag": tag, "cls": m.group("cls") or "", "anno": m.group("anno") or ""}
            )
            stack.append([])
        else:
            children = stack.pop() if len(stack) > 1 else []
            if open_tags:
                opened = open_tags.pop()
                if opened["tag"] != tag:
                    raise ValueError(f"Incorrect end tag: {opened['tag']}")
                anno = opened["anno"].strip()
                head = f"{tag}{opened['cls']}"
                start = f"<{head} {anno}>" if anno else f"<{head}>"
                stack[-1].append(f"{start}{''.join(children)}</{tag}>")
        pos = m.end()
    if pos < len(cue_text):
        stack[-1].extend(_render_text_lines(cue_text[pos:]))

    components = stack[0]
    single_voice = (
        len(components) == 1
        and components[0].startswith("<v")
        and components[0].endswith("</v>")
    )
    return components, single_voice


class _Cue:
    __slots__ = ("identifier", "start", "end", "text")

    def __init__(self, identifier: Optional[str], start: float, end: float):
        self.identifier = identifier
        self.start = timestamp_seconds(start)
        self.end = timestamp_seconds(end)
        self.text = ""

    def format(self, omit_hours_if_zero: bool, omit_voice_end: bool) -> str:
        components, single_voice = _normalize_cue_text(self.text.strip())
        payload = "".join(components)
        if omit_voice_end and single_voice:
            payload = payload.removesuffix("</v>")
        head = f"{self.identifier}\n" if self.identifier else ""
        timings = (
            f"{format_timestamp(self.start, omit_hours_if_zero)} --> "
            f"{format_timestamp(self.end, omit_hours_if_zero)}"
        )
        return f"{head}{timings}\n{payload}\n"


# --- item -> formatted cue text ----------------------------------------------


def _cue_span(text: str, tag: str, anno: Optional[str] = None) -> str:
    if anno is not None:
        return f"<{tag} {anno}>{text}</{tag}>"
    return f"<{tag}>{text}</{tag}>"


def _format_item_text(item: dict) -> str:
    """Formatting tags innermost-to-outermost: b, i, u, then the voice span."""
    text = item.get("text") or ""
    fmt = item.get("formatting") or {}
    if fmt.get("bold"):
        text = _cue_span(text, "b")
    if fmt.get("italic"):
        text = _cue_span(text, "i")
    if fmt.get("underline"):
        text = _cue_span(text, "u")
    source = _track_source(item)
    if source and source.get("voice"):
        text = _cue_span(text, "v", source["voice"])
    return text


def _track_source(item: dict) -> Optional[dict]:
    source = item.get("source")
    if source and isinstance(source, list) and (source[0] or {}).get("kind") == "track":
        return source[0]
    return None


def export_to_webvtt(
    doc: Doc,
    omit_hours_if_zero: bool = False,
    omit_voice_end: bool = False,
) -> str:
    """Serialize the document's track-sourced text items to WebVTT."""
    title: Optional[str] = None
    cues: list[_Cue] = []
    current: Optional[_Cue] = None
    consumed: set[str] = set()

    def emit(part_text: str, source: dict) -> None:
        nonlocal current
        identifier = source.get("identifier")
        start, end = source["start_time"], source["end_time"]
        if (
            current is not None
            and current.identifier == identifier
            and current.start == timestamp_seconds(start)
            and current.end == timestamp_seconds(end)
        ):
            combined = merge_tag_pairs(current.text.rstrip() + "\n" + part_text)
            current.text = combined + "\n"
        else:
            if current is not None and current.text:
                cues.append(current)
            current = _Cue(identifier, start, end)
            current.text = part_text + "\n"

    for item, _lvl in doc.iterate_items(with_groups=True, included_content_layers={"body"}):
        ref = item.get("self_ref")
        if ref in consumed:
            continue
        if M.is_inline_group(item):
            children = [doc.resolve_ref(r) for r in item.get("children", ())]
            consumed.update(c.get("self_ref") for c in children)
            parts = [
                _format_item_text(c)
                for c in children
                if c.get("text") and _track_source(c)
            ]
            text = merge_tag_pairs("".join(parts))
            first = next((c for c in children if _track_source(c)), None)
            if text and first is not None:
                emit(text, _track_source(first))
            continue
        if M.is_group(item) or not isinstance(item.get("text"), str):
            continue
        if item.get("label") == M.TITLE:
            if item["text"]:
                title = item["text"]
            continue
        source = _track_source(item)
        if not item["text"] or source is None:
            continue
        emit(_format_item_text(item), source)

    if current is not None and current.text:
        cues.append(current)

    parts = [f"WEBVTT {title}\n" if title else "WEBVTT\n"]
    for cue in cues:
        parts.append("\n")
        parts.append(cue.format(omit_hours_if_zero, omit_voice_end))
    return "".join(parts).rstrip("\n")
