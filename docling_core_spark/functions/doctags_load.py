"""DocTags -> Doc parsing (reference document.py:4083-4649, utils.py:237-413).

Pure string processing: regex tag split, <loc_d>/500 bboxes, OTSL table
decode, picture classification tags, key-value graph parse.  Runs per-row
inside the Spark extract stage for doctags-format inputs, and serves as the
round-trip oracle for the DocTags serializer.
"""

from __future__ import annotations

import itertools
import re
from typing import Optional

from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc

_TAG_TO_LABEL = {
    "title": M.TITLE,
    "document_index": M.DOCUMENT_INDEX,
    "otsl": M.TABLE,
    **{f"section_header_level_{i}": M.SECTION_HEADER for i in range(1, 7)},
    "checkbox_selected": M.CHECKBOX_SELECTED,
    "checkbox_unselected": M.CHECKBOX_UNSELECTED,
    "text": M.TEXT,
    "page_header": M.PAGE_HEADER,
    "page_footer": M.PAGE_FOOTER,
    "formula": M.FORMULA,
    "caption": M.CAPTION,
    "picture": M.PICTURE,
    "list_item": M.LIST_ITEM,
    "footnote": M.FOOTNOTE,
    "code": M.CODE,
    "key_value_region": M.KEY_VALUE_REGION,
}

_STRUCT_TOKENS = ("<ecel>", "<fcel>", "<lcel>", "<ucel>", "<xcel>", "<nl>", "<ched>", "<rhed>", "<srow>")
_CELL_TOKENS = ("<fcel>", "<ecel>", "<ched>", "<rhed>", "<srow>")

# picture classification labels recognized in doctags streams, in the
# reference's match-priority order (document.py:4153-4228)
_PIC_CLASSES = [
    "logo", "photograph", "icon", "engineering_drawing", "line_chart",
    "bar_chart", "other", "table", "flow_chart", "screenshot_from_computer",
    "signature", "screenshot_from_manual", "geographical_map", "pie_chart",
    "page_thumbnail", "stamp", "music", "calendar", "qr_code", "bar_code",
    "full_page_image", "scatter_plot", "chemistry_structure",
    "topographical_map", "crossword_puzzle", "box_plot",
    # legacy v1
    "stacked_bar_chart", "scatter_chart", "heatmap", "natural_image",
    "remote_sensing", "screenshot", "chemistry_molecular_structure",
    "chemistry_markush_structure", "picture_group",
    # legacy SmolDocling
    "line", "dot_line", "vbar_categorical", "hbar_categorical",
]
_PIC_CLASS_REMAP = {
    "line": "line_chart",
    "dot_line": "line_chart",
    "vbar_categorical": "bar_chart",
    "hbar_categorical": "bar_chart",
}

_CODE_LANGS = {
    "Ada", "Awk", "Bash", "bc", "C", "C#", "C++", "CMake", "COBOL", "CSS",
    "Ceylon", "Clojure", "Crystal", "Cuda", "Cython", "D", "Dart", "dc",
    "Dockerfile", "Elixir", "Erlang", "FORTRAN", "Forth", "Go", "HTML",
    "Haskell", "Haxe", "Java", "JavaScript", "Julia", "Kotlin", "Lisp", "Lua",
    "Matlab", "MoonScript", "Nim", "OCaml", "ObjectiveC", "Octave", "PHP",
    "Pascal", "Perl", "Prolog", "Python", "Racket", "Ruby", "Rust", "SML",
    "SQL", "Scala", "Scheme", "Swift", "TypeScript", "unknown", "VisualBasic",
    "XML", "YAML",
}

_TAG_PATTERN = re.compile(
    r"<(?P<tag>title|document_index|checkbox_unselected|checkbox_selected|"
    r"text|page_header|inline|page_footer|formula|caption|picture|footnote|code|"
    r"section_header_level_[1-6]|ordered_list|unordered_list|key_value_region|"
    r"chart|otsl)>"
    r"(?P<content>.*?)"
    r"(?:(?P<closed></(?P=tag)>)|(?P<eof>$))",
    re.DOTALL,
)
_LOC_RE = re.compile(r"<loc_(\d+)>")
_INNER_TEXT_RE = re.compile(r"<(?!_.*?_>)[a-zA-Z/][^>]*>")
_CAPTION_RE = re.compile(r"<caption>(.*?)</caption>", re.DOTALL)
_LIST_ITEM_RE = re.compile(r"<(?P<tag>list_item)>.*?</(?P=tag)>", re.DOTALL)
_KV_CELL_RE = re.compile(
    r"<(?P<label>key|value)_(?P<id>\d+)>(?P<content>.*?)</(?P=label)_(?P=id)>", re.DOTALL
)


def _extract_bbox(chunk: str) -> Optional[dict]:
    coords = _LOC_RE.findall(chunk)[:4]
    if len(coords) == 4:
        l, t, r, b = (float(c) / 500 for c in coords)
        return {"l": l, "t": t, "r": r, "b": b, "coord_origin": "TOPLEFT"}
    return None


def _scale_bbox(bbox: dict, w: float, h: float) -> dict:
    return {
        "l": bbox["l"] * w,
        "t": bbox["t"] * h,
        "r": bbox["r"] * w,
        "b": bbox["b"] * h,
        "coord_origin": bbox.get("coord_origin", "TOPLEFT"),
    }


def _inner_text(chunk: str) -> str:
    return _INNER_TEXT_RE.sub("", chunk).strip()


def _prov(bbox: Optional[dict], w: float, h: float, page_no: int, text_len: int) -> Optional[list]:
    if bbox is None:
        return None
    return [{"page_no": page_no, "bbox": _scale_bbox(bbox, w, h), "charspan": [0, text_len]}]


# ---------------------------------------------------------------------------
# OTSL table decoding (reference utils.py:237-413)
# ---------------------------------------------------------------------------


def _otsl_tokens_and_mixed(s: str) -> tuple[list[str], list[str]]:
    pattern = re.compile(r"(<[^>]+>)")
    drop = lambda tok: tok.startswith("<loc_") or tok in ("<otsl>", "</otsl>")  # noqa: E731
    tokens = [t for t in pattern.findall(s) if not drop(t)]
    mixed = [p for p in pattern.split(s) if not drop(p)]
    mixed = [p for p in mixed if p.strip()]
    return tokens, mixed


def parse_otsl_table_content(otsl_content: str) -> dict:
    """Decode an OTSL token stream into TableData (cells + span intervals)."""
    tokens, mixed = _otsl_tokens_and_mixed(otsl_content)
    tokens = [t for t in tokens if t in _STRUCT_TOKENS]
    rows = [list(y) for x, y in itertools.groupby(tokens, lambda z: z == "<nl>") if not x]

    def count_right(c: int, r: int, which: tuple) -> int:
        span, ci = 0, c
        while rows[r][ci] in which:
            ci += 1
            span += 1
            if ci >= len(rows[r]):
                return span
        return span

    def count_down(c: int, r: int, which: tuple) -> int:
        span, ri = 0, r
        while rows[ri][c] in which:
            ri += 1
            span += 1
            if ri >= len(rows):
                return span
        return span

    cells: list[dict] = []
    r_idx = c_idx = 0
    for i, text in enumerate(mixed):
        if text in _CELL_TOKENS:
            row_span = col_span = 1
            cell_text = ""
            right_offset = 1
            if text != "<ecel>":
                cell_text = mixed[i + 1] if i + 1 < len(mixed) else ""
                right_offset = 2
            next_right = mixed[i + right_offset] if i + right_offset < len(mixed) else ""
            next_bottom = ""
            if r_idx + 1 < len(rows) and c_idx < len(rows[r_idx + 1]):
                next_bottom = rows[r_idx + 1][c_idx]
            if next_right in ("<lcel>", "<xcel>"):
                col_span += count_right(c_idx + 1, r_idx, ("<lcel>", "<xcel>"))
            if next_bottom in ("<ucel>", "<xcel>"):
                row_span += count_down(c_idx, r_idx + 1, ("<ucel>", "<xcel>"))
            # NOTE: like the reference decoder (utils.py:375-385), header/row
            # flags are NOT recovered from <ched>/<rhed>/<srow> — the OTSL
            # round-trip is lossy on cell roles by design
            cells.append(
                {
                    "row_span": row_span,
                    "col_span": col_span,
                    "start_row_offset_idx": r_idx,
                    "end_row_offset_idx": r_idx + row_span,
                    "start_col_offset_idx": c_idx,
                    "end_col_offset_idx": c_idx + col_span,
                    "text": cell_text.strip(),
                    "column_header": False,
                    "row_header": False,
                    "row_section": False,
                }
            )
        if text in _STRUCT_TOKENS and text != "<nl>":
            c_idx += 1
        if text == "<nl>":
            r_idx += 1
            c_idx = 0
    return {
        "table_cells": cells,
        "num_rows": len(rows),
        "num_cols": max((len(r) for r in rows), default=0),
    }


# ---------------------------------------------------------------------------
# Main loader
# ---------------------------------------------------------------------------


def split_pages(doctags: str) -> list[str]:
    """Split a multipage <doctag> stream on <page_break> (doctags.py:63-80).

    Exact reference behavior: removeprefix/removesuffix on the raw string
    (a trailing newline after </doctag> leaves the close tag in the last
    page chunk, where the tag regex simply ignores it).
    """
    body = doctags.removeprefix("<doctag>").removesuffix("</doctag>")
    return [p.strip() for p in body.split("<page_break>")]


def load_from_doctags(doctags: str, name: str = "Document",
                      images: "Optional[list]" = None) -> Doc:
    """Parse a DocTags stream (single or multipage) into a Doc.

    Without page images, page size is 1x1 and bboxes stay normalized — same
    as the reference's no-image path.  ``images`` pairs one page image
    (path or bytes) per page: page sizes come from the PNG/JPEG header (the
    reference opens them with PIL), provenances scale to pixel coordinates,
    and pictures/pages carry crop-sized image refs (without the embedded
    data URI, which would need an image encoder).
    """
    doc = Doc(name=name)
    pages = split_pages(doctags)
    pg_w = pg_h = 1.0

    page_dims: list = []
    if images:
        from pathlib import Path as _Path

        from docling_core_spark.sources.doclang_archive import _image_size

        for img in images:
            if img is None:
                page_dims.append(None)
                continue
            data = bytes(img) if isinstance(img, (bytes, bytearray)) else _Path(img).read_bytes()
            page_dims.append(_image_size(data))

    def add_text_like(full_chunk: str, bbox: Optional[dict], page_no: int, tag: str, parent=None) -> None:
        label = _TAG_TO_LABEL.get(tag, M.TEXT)
        text = _inner_text(full_chunk)
        layer = "furniture" if label in (M.PAGE_HEADER, M.PAGE_FOOTER) else None
        if label == M.SECTION_HEADER:
            prov = _prov(bbox, pg_w, pg_h, page_no, len(text))
            doc.add_heading(text, level=int(tag.split("_")[-1]), prov=prov or [], parent=parent,
                            content_layer=layer)
        elif label == M.CODE:
            lang = "unknown"
            m = re.match(r"^<_([^>]+)_>", text)
            if m:
                text = text[m.end():]
                if m.group(1) in _CODE_LANGS:
                    lang = m.group(1)
            prov = _prov(bbox, pg_w, pg_h, page_no, len(text))
            doc.add_code(text, code_language=lang, prov=prov or [], parent=parent, content_layer=layer)
        else:
            prov = _prov(bbox, pg_w, pg_h, page_no, len(text))
            doc.add_text(label, text, prov=prov or [], parent=parent, content_layer=layer)

    def extract_caption(chunk: str, page_no: int) -> tuple[Optional[dict], Optional[dict]]:
        m = _CAPTION_RE.search(chunk)
        if m is None:
            return None, None
        content = m.group(1)
        bbox = _extract_bbox(content)
        item = doc.add_text(M.CAPTION, _inner_text(content), parent=None)
        return item, bbox

    for pg_idx, page_tokens in enumerate(pages):
        page_no = pg_idx + 1
        dims = page_dims[pg_idx] if pg_idx < len(page_dims) else None
        pg_w, pg_h = (float(dims[0]), float(dims[1])) if dims else (1.0, 1.0)
        page = doc.add_page(page_no, pg_w, pg_h)
        if dims:
            page["image"] = {
                "mimetype": "image/png",
                "dpi": 72,
                "size": {"width": pg_w, "height": pg_h},
            }

        for match in _TAG_PATTERN.finditer(page_tokens):
            full_chunk = match.group(0)
            tag = match.group("tag")
            bbox = _extract_bbox(full_chunk)
            if not match.group("closed"):
                full_chunk = f"<{tag}></{tag}>"

            if tag == "otsl":
                table_data = parse_otsl_table_content(full_chunk)
                caption, caption_bbox = extract_caption(full_chunk, page_no)
                if caption is not None and caption_bbox is not None:
                    caption["prov"].append(
                        {
                            "page_no": page_no,
                            "bbox": _scale_bbox(caption_bbox, pg_w, pg_h),
                            "charspan": [0, len(caption["text"])],
                        }
                    )
                prov = _prov(bbox, pg_w, pg_h, page_no, 0)
                doc.add_table(data=table_data, prov=prov or [], caption=caption)
            elif tag == "inline":
                group = doc.add_inline_group()
                content = match.group("content")
                common_bbox = _extract_bbox(content)
                for im in _TAG_PATTERN.finditer(content):
                    add_text_like(im.group(0), common_bbox, page_no, im.group("tag"), parent=group)
            elif tag in ("picture", "chart"):
                caption, caption_bbox = extract_caption(full_chunk, page_no)
                classification = None
                for cls in _PIC_CLASSES:
                    if f"<{cls}>" in full_chunk:
                        classification = _PIC_CLASS_REMAP.get(cls, cls)
                        break
                table_data = parse_otsl_table_content(full_chunk) if tag == "chart" else None
                pic_title = classification if classification is not None else "other"
                if bbox:
                    image_ref = None
                    if dims:
                        # reference crop box truncates normalized coords x
                        # pixel dims (document.py:4490-4499); the crop SIZE is
                        # derivable without decoding the image
                        crop_w = int(bbox["r"] * pg_w) - int(bbox["l"] * pg_w)
                        crop_h = int(bbox["b"] * pg_h) - int(bbox["t"] * pg_h)
                        image_ref = {
                            "mimetype": "image/png",
                            "dpi": 72,
                            "size": {"width": float(crop_w), "height": float(crop_h)},
                        }
                    pic = doc.add_picture(
                        prov=[{"page_no": page_no, "bbox": _scale_bbox(bbox, pg_w, pg_h),
                               "charspan": [0, 0]}],
                        image=image_ref,
                    )
                    if caption is not None and caption_bbox is not None:
                        caption["prov"].append(
                            {
                                "page_no": page_no,
                                "bbox": _scale_bbox(caption_bbox, pg_w, pg_h),
                                "charspan": [0, len(caption["text"])],
                            }
                        )
                        pic["captions"].append({"$ref": caption["self_ref"]})
                    if classification is not None:
                        meta = pic.setdefault("meta", {})
                        meta["classification"] = {
                            "predictions": [
                                {
                                    "class_name": classification,
                                    "confidence": 1.0,
                                    "created_by": "load_from_doctags",
                                }
                            ]
                        }
                    if table_data is not None:
                        meta = pic.setdefault("meta", {})
                        meta["tabular_chart"] = {"title": pic_title, "chart_data": table_data}
            elif tag == "key_value_region":
                graph, kv_prov = _parse_key_value(full_chunk)
                doc.add_key_values(graph=graph, prov=kv_prov or [])
            elif tag in ("ordered_list", "unordered_list"):
                enumerated = tag == "ordered_list"
                group = doc.add_list_group(name="list")
                for n, li in enumerate(_LIST_ITEM_RE.finditer(full_chunk), start=1):
                    li_chunk = li.group(0)
                    text = _inner_text(li_chunk)
                    marker = f"{n}." if enumerated else ""
                    # list-item provs attach only when a page image exists
                    # (reference document.py: li_bbox = ... if image else None)
                    li_bbox = _extract_bbox(li_chunk) if dims else None
                    doc.add_list_item(
                        text, enumerated=enumerated, marker=marker, parent=group,
                        prov=_prov(li_bbox, pg_w, pg_h, page_no, len(text)) or [],
                    )
            else:
                add_text_like(full_chunk, bbox, page_no, tag)
    return doc


def _parse_key_value(tokens: str) -> tuple[dict, Optional[list]]:
    cells = []
    raw_links = []
    for m in _KV_CELL_RE.finditer(tokens):
        label = m.group("label")
        cell_id = int(m.group("id"))
        raw = m.group("content")
        for target in re.findall(r"<link_(\d+)>", raw):
            raw_links.append((cell_id, int(target)))
        text = re.sub(r"<loc_\d+>", "", raw)
        text = re.sub(r"<link_\d+>", "", text).strip()
        cells.append({"label": label, "cell_id": cell_id, "text": text, "orig": text})
    ids = {c["cell_id"] for c in cells}
    links = [
        {"label": "to_value", "source_cell_id": s, "target_cell_id": t}
        for s, t in raw_links
        if t in ids
    ]
    return {"cells": cells, "links": links}, None
