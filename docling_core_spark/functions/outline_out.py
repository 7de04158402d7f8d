"""Outline / table-of-contents serializer (P8b).

Byte-parity target: the reference outline serializer
(docling-core experimental/serializer/outline.py:58-818, GT fixtures
test/data/doc/2408.09869v5_*summary.{toc,mtoc,outline}.gt.{md,json,itxt}).

Semantics distilled from the reference:
- mode TABLE_OF_CONTENTS restricts labels to {title, section_header};
  mode OUTLINE keeps the default markdown label set.
- Each emitted item yields one entry: (ref, label, optional heading title,
  optional meta summary, heading level, custom summary fields).
- markdown format: per item "<heading-or-'label '>\\n\\[ref=..\\]  \\nsummary"
  stripped, joined with blank lines; a body-summary block leads when present.
- json format: flat array of {ref, item, title, summary, level, **custom},
  nulls omitted, 2-space indent.
- itxt format: "[ref=..] [title] summary…" lines indented 2 spaces per level,
  summary truncated to itxt_max_summary_length.
- start_item filters the flat entry list to the item and its deeper-level
  followers; max_level keeps headings of level <= max_level plus the children
  of kept headings.  List items, list/inline groups are never emitted.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from docling_core_spark.functions.serializers import (
    DocSerializer,
    MarkdownParams,
    SerResult,
    _res,
)
from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc

_SUMMARY_KNOWN_FIELDS = {"text", "confidence", "created_by"}

TOC_LABELS = frozenset({M.TITLE, M.SECTION_HEADER})


def _summary_of(item: dict) -> Optional[dict]:
    meta = item.get("meta") or {}
    return meta.get("summary") or None


def _custom_part(summary: dict) -> dict:
    return {
        k: v for k, v in summary.items() if k not in _SUMMARY_KNOWN_FIELDS and v is not None
    }


def format_indented_line(entry: dict, indent_size: int = 2, max_summary_length: int = 100) -> str:
    """One ITXT line: indent + [ref=..] [title] truncated-summary."""
    level = entry.get("level")
    indent = " " * (indent_size * (level if level is not None else 1))
    parts = [f"[ref={entry['ref']}]"]
    if entry.get("title") is not None:
        parts.append(f"[{entry['title']}]")
    summary = entry.get("summary")
    if summary:
        if len(summary) > max_summary_length:
            summary = summary[: max_summary_length - 3] + "..."
        parts.append(summary)
    return indent + " ".join(parts)


class OutlineSerializer(DocSerializer):
    """Outline/TOC serializer over the dict document model."""

    def __init__(
        self,
        doc: Doc,
        mode: str = "outline",
        format: str = "markdown",
        include_non_meta: bool = True,
        itxt_max_summary_length: int = 100,
        start_item: Optional[dict] = None,
        max_level: Optional[int] = None,
        params: Optional[MarkdownParams] = None,
        **overrides: Any,
    ):
        if params is None:
            if mode == "table_of_contents" and "labels" not in overrides:
                overrides["labels"] = TOC_LABELS
            params = MarkdownParams(**overrides)
        super().__init__(doc, params)
        self.mode = mode
        self.format = format
        self.include_non_meta = include_non_meta
        self.itxt_max_summary_length = itxt_max_summary_length
        self.start_item = start_item
        self.max_level = max_level
        self._md = DocSerializer(doc)  # heading text rendering for markdown

    # -- entry construction ------------------------------------------------

    def _entry(self, item: dict) -> dict:
        label = item.get("label")
        entry: dict[str, Any] = {"ref": item["self_ref"], "item": label}
        title: Optional[str] = None
        if self.include_non_meta and label in (M.TITLE, M.SECTION_HEADER):
            if self.format in ("json", "itxt"):
                title = item.get("text", "")
            else:
                title = self._md._serialize_text_item(item, set(), False).text.strip()
        entry["title"] = title
        summary = _summary_of(item)
        entry["summary"] = summary.get("text") if summary else None
        if label == M.TITLE:
            entry["level"] = 1
        elif label == M.SECTION_HEADER:
            entry["level"] = item.get("level", 1)
        else:
            entry["level"] = None
        if summary:
            entry.update(_custom_part(summary))
        return entry

    def _entry_part(self, item: dict) -> SerResult:
        return _res(json.dumps(self._entry(item), ensure_ascii=False), item)

    # -- per-item overrides --------------------------------------------------

    def _serialize_text_item(self, item, visited, is_inline_scope):  # noqa: ARG002
        if item.get("label") == M.LIST_ITEM:
            return _res()
        return self._entry_part(item)

    def _serialize_table(self, item, visited, nested=False):  # noqa: ARG002
        self._mark_subtree_visited(item, visited)
        if M.TABLE not in self.params.labels:
            return _res()
        return self._entry_part(item)

    def _serialize_picture(self, item, visited):  # noqa: ARG002
        if M.PICTURE not in self.params.labels:
            return _res()
        return self._entry_part(item)

    def _serialize_list_group(self, item, visited, list_level, is_inline_scope):
        # list containers are skipped but their non-list-item descendants
        # still flow through the traversal
        parts = self.get_parts(item=item, visited=visited)
        return _res("\n\x00".join(p.text for p in parts if p.text), parts)

    def _serialize_inline_group(self, item, visited, list_level):  # noqa: ARG002
        self._mark_subtree_visited(item, visited)
        return _res()

    def serialize_meta(self, item):  # noqa: ARG002
        return _res()

    def _requires_page_break(self) -> bool:
        return False

    # -- filters (reference outline.py:687-771) ------------------------------

    def _filter_start(self, entries: list[dict]) -> list[dict]:
        start = self.start_item
        assert start is not None
        start_level = start.get("level") if start.get("label") == M.SECTION_HEADER else None
        out: list[dict] = []
        found = False
        for e in entries:
            if not found:
                if e["ref"] == start["self_ref"]:
                    found = True
                    out.append(e)
                continue
            lvl = e.get("level")
            if start_level is not None and lvl is not None:
                if lvl <= start_level:
                    break
                out.append(e)
            else:
                out.append(e)
        return out

    def _filter_max_level(self, entries: list[dict]) -> list[dict]:
        assert self.max_level is not None
        out: list[dict] = []
        include_children = True
        for e in entries:
            label, lvl = e.get("item"), e.get("level")
            if label == M.SECTION_HEADER and lvl is not None:
                include_children = lvl <= self.max_level
                if include_children:
                    out.append(e)
            elif label == M.TITLE:
                include_children = self.max_level >= 1
                if include_children:
                    out.append(e)
            elif include_children:
                out.append(e)
        return out

    # -- document assembly -----------------------------------------------------

    def serialize_doc(self, parts: list[SerResult]) -> SerResult:
        entries: list[dict] = []
        for part in parts:
            if not part.text:
                continue
            # list-group containers pack their children with a \x00 separator
            for chunk in part.text.split("\n\x00"):
                try:
                    entries.append(json.loads(chunk))
                except json.JSONDecodeError:
                    continue

        if self.start_item is not None:
            entries = self._filter_start(entries)
        if self.max_level is not None:
            entries = self._filter_max_level(entries)

        body_summary = _summary_of(self.doc.body)
        add_body = body_summary is not None and self.start_item is None

        if self.format in ("json", "itxt"):
            if add_body:
                body_entry: dict[str, Any] = {
                    "ref": self.doc.body["self_ref"],
                    "item": M.SECTION_HEADER,
                    "title": self.doc.name if self.include_non_meta else None,
                    "summary": body_summary.get("text"),
                    "level": 0,
                }
                body_entry.update(_custom_part(body_summary))
                entries.insert(0, body_entry)
            if self.format == "json":
                clean = [{k: v for k, v in e.items() if v is not None} for e in entries]
                return _res(json.dumps(clean, ensure_ascii=False, indent=2), parts)
            if self.start_item is not None and entries:
                min_level = min(
                    e["level"] if e.get("level") is not None else 0 for e in entries
                )
                for e in entries:
                    if e.get("level") is not None:
                        e["level"] = e["level"] - min_level
            lines = [
                format_indented_line(e, max_summary_length=self.itxt_max_summary_length)
                for e in entries
            ]
            return _res("\n".join(lines), parts)

        # markdown format
        blocks: list[str] = []
        if add_body:
            body_parts = []
            if self.include_non_meta:
                body_parts.append(f"# {self.doc.name}")
            body_parts.append(f"\\[ref={self.doc.body['self_ref']}\\]  ")
            body_parts.append(body_summary.get("text") or "")
            blocks.append("\n".join(body_parts).strip())
        for e in entries:
            text_parts = []
            if self.include_non_meta:
                if e.get("title") is not None:
                    text_parts.append(e["title"])
                else:
                    text_parts.append(f"{e['item']} ")
            text_parts.append(f"\\[ref={e['ref']}\\]  ")
            if e.get("summary"):
                text_parts.append(e["summary"])
            blocks.append("\n".join(text_parts).strip())
        return _res("\n\n".join(b for b in blocks if b), parts)


def export_to_outline(
    doc: Doc,
    mode: str = "outline",
    format: str = "markdown",
    include_non_meta: bool = True,
    **kwargs: Any,
) -> str:
    """Serialize the document outline/TOC in markdown, json, or itxt form."""
    ser = OutlineSerializer(
        doc, mode=mode, format=format, include_non_meta=include_non_meta, **kwargs
    )
    return ser.serialize().text
