"""DocLang deserializer (S5, load half).

Parity target: docling-core transforms/deserializer/doclang.py:128-2144.
Parses DocLang XML back into the dict document model: text-like tokens with
formatting/threading, headings (level 1 -> title), lists with ldiv-delimited
items and virtual text, inline groups, OTSL tables (spans from continuation
tokens, per-cell locations, rich cells as dispatched groups), pictures with
classification labels and captions/footnotes, provenance from quantized
location tokens on synthetic resolution-square pages, page breaks, and
element-head meta (summary/description).

Covers field-kv markup: field_region/field_item containers, key/value (flat
text, inline-container, and generic-children forms with checkbox-label
merging), field headings/hints, fillable kinds. Legacy graph items are not
reconstructed (the serializer never emits them; markers inside field items
are lossy, as in the reference).

Out of scope v1 (documented): archive media resolution (PIL absent),
temporal tokens.
"""

from __future__ import annotations

from itertools import groupby
from typing import Optional, Sequence
from xml.dom.minidom import Element, Node, Text, parseString

from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc

DFLT_RESOLUTION = 512

_HEAD_TAGS = frozenset(
    {"label", "layer", "href", "location", "caption", "description", "summary",
     "custom", "thread", "xref", "hour", "minute", "second", "centisecond"}
)
_FORMAT_TAGS = frozenset(
    {"bold", "italic", "underline", "strikethrough", "superscript", "subscript", "rtl"}
)
_TEXT_LIKE = frozenset(
    {"text", "caption", "footnote", "page_header", "page_footer", "code", "formula",
     "ldiv", "content"} | _FORMAT_TAGS
)
_OTSL_TOKENS = frozenset(
    {"fcel", "ecel", "lcel", "ucel", "xcel", "nl", "ched", "rhed", "srow", "corn"}
)
_SEGMENT_SIBLING_TAGS = frozenset({"list", "picture"})
_VIRTUAL_TEXT_TAGS = _FORMAT_TAGS | {"content", "handwriting", "br", "checkbox"}
_SEMANTIC_OR_GROUPING = frozenset(
    {"heading", "text", "caption", "description", "summary", "footnote",
     "page_header", "page_footer", "picture", "formula", "code", "ldiv",
     "checkbox", "table", "tabular", "field_region", "field_item", "key",
     "value", "field_heading", "hint", "list", "group"}
)

# GitHub-Linguist key -> Docling code_language (reverse of the serializer map,
# Octave/DocLang excluded so MATLAB/XML win)
from docling_core_spark.functions.doclang_out import _CODE_LANGUAGE_TO_LINGUIST  # noqa: E402

_LINGUIST_TO_CODE_LANGUAGE = {
    v: k for k, v in _CODE_LANGUAGE_TO_LINGUIST.items() if k not in ("Octave", "DocLang")
}


def _is_el(node: Node) -> bool:
    return isinstance(node, Element)


def _enforce_doclang_dom_budgets(root: Element, max_depth: int, max_elements: int) -> None:
    """Depth/element-count caps over the parsed DOM (reference
    transforms/deserializer/doclang.py _enforce_doclang_dom_budgets)."""
    if max_depth <= 0:
        raise ValueError(f"max_doclang_xml_depth must be positive, got {max_depth}")
    if max_elements <= 0:
        raise ValueError(f"max_doclang_xml_elements must be positive, got {max_elements}")
    element_count = 0
    stack: list[tuple[Element, int]] = [(root, 1)]
    while stack:
        node, depth = stack.pop()
        element_count += 1
        if element_count > max_elements:
            raise ValueError(f"DocLang XML exceeds element count limit of {max_elements}")
        if depth > max_depth:
            raise ValueError(f"DocLang XML exceeds nesting depth limit of {max_depth}")
        for child in node.childNodes:
            if _is_el(child):
                stack.append((child, depth + 1))


class DocLangDeserializer:
    """Stateful walker building a Doc from DocLang XML.

    Untrusted-markup budgets (reference deserializer/doclang.py:136-165):
    size is gated before parse, depth/element count after — all three are
    env-configurable via ``DOCLINGCORE_MAX_DOCLANG_XML_*`` (model/settings.py)
    or per-instance overrides.
    """

    def __init__(
        self,
        media_root=None,
        max_xml_bytes: Optional[int] = None,
        max_xml_depth: Optional[int] = None,
        max_xml_elements: Optional[int] = None,
    ) -> None:
        from docling_core_spark.model.settings import settings

        self._page_no = 1
        self._resolution = DFLT_RESOLUTION
        self._threads: dict[tuple[str, str], dict] = {}
        self._media_root = media_root
        self._max_xml_bytes = (
            max_xml_bytes if max_xml_bytes is not None else settings.max_doclang_xml_bytes
        )
        self._max_xml_depth = (
            max_xml_depth if max_xml_depth is not None else settings.max_doclang_xml_depth
        )
        self._max_xml_elements = (
            max_xml_elements if max_xml_elements is not None else settings.max_doclang_xml_elements
        )

    # -- entry ----------------------------------------------------------------

    def _parse_budgeted(self, text: str) -> Element:
        if self._max_xml_bytes <= 0:
            raise ValueError(
                f"max_doclang_xml_bytes must be positive, got {self._max_xml_bytes}"
            )
        if len(text.encode("utf-8")) > self._max_xml_bytes:
            raise ValueError(
                f"DocLang XML exceeds size limit of {self._max_xml_bytes} bytes"
            )
        root = parseString(text).documentElement
        if root is None:
            raise ValueError("Invalid DocLang XML: missing documentElement")
        _enforce_doclang_dom_budgets(
            root, max_depth=self._max_xml_depth, max_elements=self._max_xml_elements
        )
        return root

    def deserialize(self, text: str, page_no: int = 1) -> Doc:
        root = self._parse_budgeted(text)
        if root.tagName != "doclang":
            cands = root.getElementsByTagName("doclang")
            if cands:
                root = cands[0]
        doc = Doc("Document")
        self._page_no = page_no
        self._threads = {}
        self._ensure_page(doc)
        for node in root.childNodes:
            if _is_el(node):
                self._dispatch(doc, node, None)
        return doc

    # -- shared helpers ----------------------------------------------------------

    def _ensure_page(self, doc: Doc) -> None:
        if str(self._page_no) not in doc.pages and self._page_no not in doc.pages:
            doc.add_page(self._page_no, self._resolution, self._resolution)

    def _split_head_body(self, el: Element) -> tuple[list[Node], list[Node]]:
        head: list[Node] = []
        body: list[Node] = []
        in_body = False
        for node in el.childNodes:
            if not in_body:
                if isinstance(node, Text) and not node.data.strip():
                    head.append(node)
                    continue
                if _is_el(node) and node.tagName in _HEAD_TAGS:
                    head.append(node)
                    continue
                in_body = True
            body.append(node)
        return head, body

    def _provs_from_nodes(self, doc: Doc, nodes: Sequence[Node]) -> list[dict]:
        provs: list[dict] = []
        values: list[int] = []
        for node in nodes:
            if not _is_el(node) or node.tagName != "location":
                continue
            try:
                values.append(int(node.getAttribute("value") or "0"))
            except ValueError:
                values.append(0)
            if len(values) == 4:
                self._ensure_page(doc)
                l, t = float(min(values[0], values[2])), float(min(values[1], values[3]))
                r, b = float(max(values[0], values[2])), float(max(values[1], values[3]))
                provs.append(
                    {
                        "page_no": self._page_no,
                        "bbox": {"l": l, "t": t, "r": r, "b": b, "coord_origin": "TOPLEFT"},
                        "charspan": [0, 0],
                    }
                )
                values = []
        return provs

    def _extract_provenance(self, doc: Doc, el: Element) -> list[dict]:
        head, _ = self._split_head_body(el)
        return self._provs_from_nodes(doc, head)

    def _head_attr(self, el: Element, tag: str, attr: str) -> Optional[str]:
        head, _ = self._split_head_body(el)
        for node in head:
            if _is_el(node) and node.tagName == tag:
                if v := node.getAttribute(attr):
                    return v
        return None

    def _extract_layer(self, el: Element) -> Optional[str]:
        layer = self._head_attr(el, "layer", "value")
        return layer if layer in M.CONTENT_LAYERS else None

    def _extract_thread_id(self, el: Element) -> Optional[str]:
        return self._head_attr(el, "thread", "thread_id")

    def _get_text(self, el: Element) -> str:
        out: list[str] = []
        for node in el.childNodes:
            if isinstance(node, Text):
                if node.data.strip():
                    out.append(node.data if el.tagName == "content" else node.data.strip())
            elif _is_el(node):
                # head tokens (summary/description/caption/...) are item
                # properties, never body text — skipping only <location> (as
                # the reference does) would leak meta text into item.text
                if node.tagName in _HEAD_TAGS:
                    continue
                if node.tagName == "br":
                    out.append("\n")
                else:
                    out.append(self._get_text(node))
        return "".join(out)

    def _extract_text_with_formatting(self, el: Element) -> tuple[str, Optional[dict]]:
        children = [n for n in el.childNodes if _is_el(n) and n.tagName != "location"]
        if len(children) == 1 and children[0].tagName in _FORMAT_TAGS:
            child = children[0]
            text, fmt = self._extract_text_with_formatting(child)
            fmt = fmt or {}
            tag = child.tagName
            if tag == "bold":
                fmt["bold"] = True
            elif tag == "italic":
                fmt["italic"] = True
            elif tag == "underline":
                fmt["underline"] = True
            elif tag == "strikethrough":
                fmt["strikethrough"] = True
            elif tag == "superscript":
                fmt["script"] = "super"
            elif tag == "subscript":
                fmt["script"] = "sub"
            return text, fmt or None
        return self._get_text(el), None

    def _simple_text_block(self, element: Element) -> Optional[str]:
        result: Optional[str] = None
        for node in element.childNodes:
            if _is_el(node):
                if node.tagName in _HEAD_TAGS:
                    continue
                if node.tagName not in (
                    {"location", "layer", "label", "br", "checkbox", "content",
                     "handwriting"} | _FORMAT_TAGS
                ):
                    return None
                if tmp := self._simple_text_block(node):
                    result = tmp
            elif isinstance(node, Text) and node.data.strip():
                if result is None:
                    result = node.data if element.tagName == "content" else node.data.strip()
                else:
                    return None
        return result

    def _apply_initial_provenance(self, item: dict, text: str, provs: list[dict]) -> None:
        if not provs:
            return
        first = dict(provs[0])
        first["charspan"] = [0, len(text)]
        item["prov"] = [first] + [dict(p) for p in provs[1:]]

    def _merge_threaded_text(self, existing: dict, text: str, provs: list[dict]) -> None:
        offset = len(existing.get("orig") or "")
        if text:
            existing["text"] = (existing.get("text") or "") + text
            existing["orig"] = (existing.get("orig") or "") + text
        span = [offset, offset + len(text)]
        for p in provs:
            existing.setdefault("prov", []).append({**dict(p), "charspan": span})

    def _apply_head_meta(self, item: dict, el: Element) -> None:
        head, _ = self._split_head_body(el)
        for node in head:
            if not _is_el(node):
                continue
            if node.tagName == "summary":
                if text := self._get_text(node).strip():
                    item.setdefault("meta", {})["summary"] = {"text": text}
            elif node.tagName == "description":
                if text := self._get_text(node).strip():
                    item.setdefault("meta", {})["description"] = {"text": text}
            elif node.tagName == "custom":
                # namespaced custom-vocabulary fields (reference deserializer
                # doclang.py:1600-1664): docling__summary/description map to
                # the native meta fields, docling__smiles to picture
                # molecule data, any other ns__name stays a custom field
                for child in node.childNodes:
                    if not _is_el(child):
                        continue
                    tag = child.tagName
                    value = self._get_text(child)
                    if tag == "docling__summary":
                        if text := value.strip():
                            item.setdefault("meta", {})["summary"] = {"text": text}
                    elif tag == "docling__description":
                        if text := value.strip():
                            item.setdefault("meta", {})["description"] = {"text": text}
                    elif tag == "docling__smiles":
                        if (smi := value.strip()) and M.ref_array(
                            item.get("self_ref", "")
                        ) == "pictures":
                            item.setdefault("meta", {})["molecule"] = {"smi": smi}
                    elif "__" in tag and tag.split("__", 1)[0] and tag.split("__", 1)[1]:
                        item.setdefault("meta", {})[tag] = value

    # -- dispatch --------------------------------------------------------------

    def _dispatch(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        name = el.tagName
        if name in _TEXT_LIKE:
            self._parse_text_like(doc, el, parent)
        elif name == "page_break":
            self._page_no += 1
            self._ensure_page(doc)
        elif name == "heading":
            self._parse_heading(doc, el, parent)
        elif name == "field_heading":
            self._parse_field_heading(doc, el, parent)
        elif name == "field_region":
            self._parse_field_region(doc, el, parent)
        elif name == "field_item":
            self._parse_field_item(doc, el, parent)
        elif name == "key":
            self._parse_field_kv(doc, el, parent, is_value=False)
        elif name == "value":
            self._parse_field_kv(doc, el, parent, is_value=True)
        elif name == "hint":
            self._parse_field_hint(doc, el, parent)
        elif name == "checkbox":
            cls = el.getAttribute("class")
            label = M.CHECKBOX_SELECTED if cls == "selected" else M.CHECKBOX_UNSELECTED
            doc.add_text(label, "", parent=parent)
        elif name == "list":
            self._parse_list(doc, el, parent)
        elif name == "group":
            if self._first_child(el, "table") or self._first_child(el, "index"):
                self._parse_table(doc, el, parent)
            elif self._first_child(el, "picture"):
                self._parse_picture(doc, el, parent)
            else:
                self._walk_children(doc, el, parent)
        elif name in ("table", "index"):
            self._parse_table(doc, el, parent)
        elif name == "picture":
            self._parse_picture(doc, el, parent)
        else:
            self._walk_children(doc, el, parent)

    def _walk_children(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        for node in el.childNodes:
            if _is_el(node):
                if node.tagName in {"head", "location", "layer", "label", "custom",
                                    "caption", "src"}:
                    continue
                self._dispatch(doc, node, parent)

    # -- text-like ----------------------------------------------------------------

    def _parse_text_like(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        element_children = [
            n for n in el.childNodes if _is_el(n) and n.tagName not in _HEAD_TAGS
        ]
        thread_id = self._extract_thread_id(el)
        simple_text = self._simple_text_block(el)
        if len(element_children) > 1 or (simple_text is None and thread_id is None):
            self._parse_inline_group(doc, el, parent)
            return

        provs = self._extract_provenance(doc, el)
        layer = self._extract_layer(el)
        text, formatting = self._extract_text_with_formatting(el)
        nm = el.tagName
        if not text:
            if thread_id and (existing := self._threads.get((thread_id, nm))) is not None:
                if provs:
                    self._merge_threaded_text(existing, "", provs)
            return

        if nm == "code":
            lang = "unknown"
            if label_val := self._head_attr(el, "label", "value"):
                lang = _LINGUIST_TO_CODE_LANGUAGE.get(label_val, "unknown")
            # code keeps raw whitespace of non-empty text nodes (reference
            # _extract_code_content_and_language, deserializer doclang.py:546)
            code_parts: list[str] = []
            for node in el.childNodes:
                if isinstance(node, Text):
                    if node.data.strip():
                        code_parts.append(node.data)
                elif _is_el(node):
                    if node.tagName in ("location", "layer", "label"):
                        continue
                    if node.tagName == "br":
                        code_parts.append("\n")
                    else:
                        code_parts.append(self._get_text(node))
            code_text = "".join(code_parts)
            if not code_text.strip():
                return
            if thread_id and (existing := self._threads.get((thread_id, nm))) is not None:
                self._merge_threaded_text(existing, code_text, provs)
                return
            item = doc.add_code(
                code_text, code_language=lang if lang != "unknown" else None,
                parent=parent, content_layer=layer,
            )
            self._apply_initial_provenance(item, code_text, provs)
            if thread_id:
                self._threads[(thread_id, nm)] = item
            self._apply_head_meta(item, el)
            return

        label_map = {
            "text": M.TEXT, "caption": M.CAPTION, "footnote": "footnote",
            "page_header": "page_header", "page_footer": "page_footer",
        }
        if nm in label_map or nm in _FORMAT_TAGS or nm == "content":
            if nm in _FORMAT_TAGS:
                formatting = formatting or {}
                key = {"superscript": ("script", "super"), "subscript": ("script", "sub")}.get(nm)
                if key:
                    formatting[key[0]] = key[1]
                elif nm != "rtl":
                    formatting[nm] = True
            label = label_map.get(nm, M.TEXT)
            if nm == "text":
                for c in element_children:
                    if c.tagName == "handwriting":
                        label = "handwritten_text"
                        break
                    if c.tagName == "checkbox":
                        cls = c.getAttribute("class")
                        if cls == "selected":
                            label = M.CHECKBOX_SELECTED
                            break
                        if cls == "unselected":
                            label = M.CHECKBOX_UNSELECTED
                            break
            if thread_id and (existing := self._threads.get((thread_id, nm))) is not None:
                self._merge_threaded_text(existing, text, provs)
                return
            item = doc.add_text(
                label, text, parent=parent, formatting=formatting, content_layer=layer
            )
            self._apply_initial_provenance(item, text, provs)
            if thread_id:
                self._threads[(thread_id, nm)] = item
            self._apply_head_meta(item, el)
        elif nm == "formula":
            if thread_id and (existing := self._threads.get((thread_id, nm))) is not None:
                self._merge_threaded_text(existing, text, provs)
                return
            item = doc.add_formula(text, parent=parent, formatting=formatting, content_layer=layer)
            self._apply_initial_provenance(item, text, provs)
            if thread_id:
                self._threads[(thread_id, nm)] = item
            self._apply_head_meta(item, el)

    def _parse_heading(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        try:
            level = int(el.getAttribute("level") or "1")
        except ValueError:
            level = 1
        provs = self._extract_provenance(doc, el)
        layer = self._extract_layer(el)
        text = self._get_text(el).strip()
        if not text:
            return
        thread_id = self._extract_thread_id(el)
        if thread_id and (existing := self._threads.get((thread_id, "heading"))) is not None:
            self._merge_threaded_text(existing, text, provs)
            return
        if level == 1:
            item = doc.add_title(text, parent=parent, content_layer=layer)
        else:
            item = doc.add_heading(text, level=level - 1, parent=parent, content_layer=layer)
        self._apply_initial_provenance(item, text, provs)
        if thread_id:
            self._threads[(thread_id, "heading")] = item
        self._apply_head_meta(item, el)

    # -- field regions / items / key-values (reference deserializer
    # doclang.py:616-900) --------------------------------------------------------

    _FIELD_INLINE_BODY_TAGS = _FORMAT_TAGS | {"content", "handwriting", "br", "checkbox", "hint"}

    def _meaningful_body_nodes(self, body_nodes: Sequence[Node]) -> list[Node]:
        return [
            n for n in body_nodes
            if _is_el(n) or (isinstance(n, Text) and n.data.strip())
        ]

    def _dispatch_body_nodes(self, doc: Doc, body_nodes: Sequence[Node], parent: dict) -> None:
        for node in body_nodes:
            if _is_el(node):
                self._dispatch(doc, node, parent)
            elif isinstance(node, Text) and node.data.strip():
                doc.add_text(M.TEXT, node.data.strip(), parent=parent)

    def _is_field_inline_body(self, body_nodes: Sequence[Node]) -> bool:
        meaningful = self._meaningful_body_nodes(body_nodes)
        if not meaningful:
            return False
        return all(
            isinstance(n, Text) or n.tagName in self._FIELD_INLINE_BODY_TAGS
            for n in meaningful
        )

    def _field_kv_needs_inline_container(self, body_nodes: Sequence[Node]) -> bool:
        """True when key/value body must become an inline group, not flat text."""
        meaningful = self._meaningful_body_nodes(body_nodes)
        element_children = [n for n in meaningful if _is_el(n)]
        if not self._is_field_inline_body(body_nodes):
            return False
        if len(element_children) > 1:
            return True
        if any(n.tagName == "checkbox" for n in element_children):
            return True
        if element_children and any(isinstance(n, Text) for n in meaningful):
            return True
        return False

    def _dispatch_field_inline_body_nodes(
        self, doc: Doc, body_nodes: Sequence[Node], parent: dict
    ) -> None:
        """Dispatch inline kv body nodes, merging checkbox labels with
        a single following text/content node."""
        meaningful = self._meaningful_body_nodes(body_nodes)
        idx = 0
        while idx < len(meaningful):
            node = meaningful[idx]
            if _is_el(node) and node.tagName == "checkbox":
                cls = node.getAttribute("class")
                label = M.CHECKBOX_SELECTED if cls == "selected" else M.CHECKBOX_UNSELECTED
                text = ""
                remaining = meaningful[idx + 1:]
                if len(remaining) == 1:
                    nxt = remaining[0]
                    if isinstance(nxt, Text):
                        text = nxt.data.strip()
                        idx += 1
                    elif _is_el(nxt) and nxt.tagName == "content":
                        text = self._get_text(nxt)
                        idx += 1
                doc.add_text(label, text, parent=parent)
                idx += 1
                continue
            if _is_el(node):
                self._dispatch(doc, node, parent)
            elif isinstance(node, Text) and node.data.strip():
                doc.add_text(M.TEXT, node.data.strip(), parent=parent)
            idx += 1

    def _parse_field_heading(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        try:
            level = int(el.getAttribute("level") or "1")
        except ValueError:
            level = 1
        provs = self._extract_provenance(doc, el)
        layer = self._extract_layer(el)
        text = self._get_text(el).strip()
        if not text:
            return
        thread_id = self._extract_thread_id(el)
        if thread_id and (existing := self._threads.get((thread_id, "field_heading"))) is not None:
            self._merge_threaded_text(existing, text, provs)
            return
        item = doc.add_field_heading(text, level=level, parent=parent, content_layer=layer)
        self._apply_initial_provenance(item, text, provs)
        if thread_id:
            self._threads[(thread_id, "field_heading")] = item

    def _parse_field_region(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        provs = self._extract_provenance(doc, el)
        fri = doc.add_field_region(parent=parent, prov=provs)
        _, body_nodes = self._split_head_body(el)
        self._dispatch_body_nodes(doc, body_nodes, fri)

    def _parse_field_item(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        provs = self._extract_provenance(doc, el)
        layer = self._extract_layer(el)
        fi = doc.add_field_item(parent=parent, prov=provs)
        if layer:
            fi["content_layer"] = layer
        _, body_nodes = self._split_head_body(el)
        self._dispatch_body_nodes(doc, body_nodes, fi)

    def _parse_field_hint(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        provs = self._extract_provenance(doc, el)
        layer = self._extract_layer(el)
        text, formatting = self._extract_text_with_formatting(el)
        text = text.strip()
        if not text:
            return
        item = doc.add_field_hint(text, parent=parent, content_layer=layer, formatting=formatting)
        self._apply_initial_provenance(item, text, provs)

    def _parse_field_kv(
        self, doc: Doc, el: Element, parent: Optional[dict], is_value: bool
    ) -> None:
        provs = self._extract_provenance(doc, el)
        layer = self._extract_layer(el)
        kind = "fillable" if is_value and el.getAttribute("class") == "fillable" else "read_only"
        _, body_nodes = self._split_head_body(el)
        simple_text = self._simple_text_block(el)
        needs_inline = self._field_kv_needs_inline_container(body_nodes)

        def add_kv(text: str, formatting: Optional[dict] = None) -> dict:
            if is_value:
                return doc.add_field_value(
                    text, kind=kind, parent=parent, content_layer=layer, formatting=formatting
                )
            return doc.add_field_key(
                text, parent=parent, content_layer=layer, formatting=formatting
            )

        if simple_text is not None and not needs_inline:
            text, formatting = self._extract_text_with_formatting(el)
            item = add_kv(text, formatting)
            self._apply_initial_provenance(item, text, provs)
            return

        item = add_kv("")
        if needs_inline:
            inline_group = doc.add_inline_group(parent=item)
            self._dispatch_field_inline_body_nodes(doc, body_nodes, inline_group)
        else:
            self._dispatch_body_nodes(doc, body_nodes, item)
        self._apply_initial_provenance(item, "", provs)

    # -- lists ------------------------------------------------------------------------

    def _first_non_ws(self, nodes: Sequence[Node]) -> Optional[Node]:
        for node in nodes:
            if isinstance(node, Text) and not node.data.strip():
                continue
            return node
        return None

    def _is_virtual_text(self, nodes: Sequence[Node]) -> bool:
        first = self._first_non_ws(nodes)
        if first is None:
            return False
        if isinstance(first, Text):
            return True
        if not _is_el(first):
            return False
        if first.tagName in _HEAD_TAGS or first.tagName in _VIRTUAL_TEXT_TAGS:
            return True
        return first.tagName not in _SEMANTIC_OR_GROUPING

    def _parse_list(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        ordered = el.getAttribute("class") == "ordered"
        head_els = [n for n in el.childNodes if _is_el(n)]
        thread_id = None
        for n in head_els:
            if n.tagName == "thread" and n.getAttribute("thread_id"):
                thread_id = n.getAttribute("thread_id")
                break
        if thread_id and (existing := self._threads.get((thread_id, "list"))) is not None:
            group = existing
        else:
            group = doc.add_list_group(parent=parent)
            if thread_id:
                self._threads[(thread_id, "list")] = group

        actual = [n for n in el.childNodes if _is_el(n) and n.tagName != "location"]
        boundaries = [i for i, n in enumerate(actual) if n.tagName == "ldiv"]
        all_nodes = list(el.childNodes)
        for bi, start in enumerate(boundaries):
            end = boundaries[bi + 1] if bi + 1 < len(boundaries) else len(actual)
            ldiv_el = actual[start]
            marker = ""
            for ch in ldiv_el.childNodes:
                if _is_el(ch) and ch.tagName == "marker":
                    marker = self._get_text(ch).strip()
                    break
            i0 = all_nodes.index(ldiv_el)
            i1 = all_nodes.index(actual[end]) if end < len(actual) else len(all_nodes)
            content_nodes = all_nodes[i0 + 1 : i1]
            content_elements = [
                n for n in actual[start + 1 : end] if not (n.tagName in _HEAD_TAGS)
            ]

            if not content_nodes:
                doc.add_list_item("", parent=group, enumerated=ordered, marker=marker)
            elif self._is_virtual_text(content_nodes):
                self._parse_li_virtual_text(doc, el, group, ordered, marker, content_nodes)
            elif len(content_elements) == 1:
                content_el = content_elements[0]
                if content_el.tagName == "text":
                    inner = [
                        n for n in content_el.childNodes
                        if _is_el(n) and n.tagName not in ("location", "layer")
                    ]
                    if len(inner) > 1 or self._simple_text_block(content_el) is None:
                        li = doc.add_list_item("", parent=group, enumerated=ordered, marker=marker)
                        self._dispatch(doc, content_el, li)
                    else:
                        # reference deserializer doclang.py:1281-1289 keeps the
                        # parsed location charspan ([0,0]) and first prov only
                        provs = self._extract_provenance(doc, content_el)
                        text = self._get_text(content_el).strip()
                        doc.add_list_item(text, parent=group, enumerated=ordered,
                                          marker=marker, prov=provs[:1] or None)
                else:
                    li = doc.add_list_item("", parent=group, enumerated=ordered, marker=marker)
                    self._dispatch(doc, content_el, li)
            else:
                first_el, remaining = content_elements[0], content_elements[1:]
                if first_el.tagName == "text" and all(
                    r.tagName in _SEGMENT_SIBLING_TAGS for r in remaining
                ):
                    inner = [
                        n for n in first_el.childNodes
                        if _is_el(n) and n.tagName not in ("location", "layer")
                    ]
                    if len(inner) <= 1 and self._simple_text_block(first_el) is not None:
                        # reference doclang.py:1324-1332: parsed charspan kept
                        provs = self._extract_provenance(doc, first_el)
                        text = self._get_text(first_el).strip()
                        li = doc.add_list_item(text, parent=group, enumerated=ordered,
                                               marker=marker, prov=provs[:1] or None)
                        for r in remaining:
                            self._dispatch(doc, r, li)
                        continue
                li = doc.add_list_item("", parent=group, enumerated=ordered, marker=marker)
                for content_el in content_elements:
                    self._dispatch(doc, content_el, li)

    def _parse_li_virtual_text(self, doc, el, group, ordered, marker, nodes) -> None:
        provs = self._provs_from_nodes(doc, nodes)
        # drop leading head tokens
        body: list[Node] = []
        skipping = True
        for node in nodes:
            if skipping:
                if isinstance(node, Text) and not node.data.strip():
                    continue
                if _is_el(node) and node.tagName in _HEAD_TAGS:
                    continue
                skipping = False
            body.append(node)
        # leading plain text (or <content>)
        text_parts: list[str] = []
        rest_start = 0
        for i, node in enumerate(body):
            if isinstance(node, Text):
                text_parts.append(node.data)
                rest_start = i + 1
            elif _is_el(node) and node.tagName == "content":
                text_parts.append(self._get_text(node))
                rest_start = i + 1
            else:
                break
        leading = "".join(text_parts).strip()
        rest = [n for n in body[rest_start:] if not (isinstance(n, Text) and not n.data.strip())]
        rest_els = [n for n in rest if _is_el(n)]

        def add_li(text: str) -> dict:
            li = doc.add_list_item(text, parent=group, enumerated=ordered, marker=marker)
            self._apply_initial_provenance(li, text, provs)
            return li

        if leading and rest_els and all(n.tagName in _SEGMENT_SIBLING_TAGS for n in rest_els):
            li = add_li(leading)
            for n in rest_els:
                self._dispatch(doc, n, li)
        elif not rest and leading:
            add_li(leading)
        elif all(
            isinstance(n, Text) or (_is_el(n) and n.tagName == "content") for n in body
        ) and any(
            (isinstance(n, Text) and n.data.strip()) or (_is_el(n) and n.tagName == "content")
            for n in body
        ):
            parts = [
                n.data if isinstance(n, Text) else self._get_text(n) for n in body
                if isinstance(n, Text) or _is_el(n)
            ]
            add_li("".join(parts).strip())
        else:
            li = add_li("")
            self._parse_inline_group(doc, el, li, nodes=body)

    # -- inline groups ---------------------------------------------------------------

    def _parse_inline_group(
        self, doc: Doc, el: Element, parent: Optional[dict], nodes: Optional[Sequence[Node]] = None
    ) -> None:
        group = doc.add_inline_group(parent=parent)
        for node in nodes if nodes is not None else el.childNodes:
            if _is_el(node):
                self._dispatch(doc, node, group)
            elif isinstance(node, Text):
                if text := node.data.strip():
                    doc.add_text(M.TEXT, text, parent=group)

    # -- tables ---------------------------------------------------------------------------

    def _first_child(self, el: Element, tag: str) -> Optional[Element]:
        for node in el.childNodes:
            if _is_el(node) and node.tagName == tag:
                return node
        return None

    def _extract_caption(self, doc: Doc, el: Element) -> Optional[dict]:
        cap_el = self._first_child(el, "caption")
        if cap_el is None:
            return None
        text = self._get_text(cap_el).strip()
        if not text:
            return None
        # parsed charspan kept as-is (reference doclang.py:1667-1683)
        provs = self._extract_provenance(doc, cap_el)
        item = doc.add_text(M.CAPTION, text, prov=list(provs) or None)
        return item

    def _extract_footnotes(self, doc: Doc, el: Element) -> list[dict]:
        out = []
        for node in el.childNodes:
            if _is_el(node) and node.tagName == "footnote":
                text = self._get_text(node).strip()
                if text:
                    provs = self._extract_provenance(doc, node)
                    item = doc.add_text("footnote", text, prov=list(provs) or None)
                    out.append(item)
        return out

    def _nodes_to_xml(self, nodes: Sequence[Node]) -> str:
        parts = []
        for node in nodes:
            if isinstance(node, Text):
                parts.append(node.data)
            elif _is_el(node):
                if node.tagName == "content":
                    parts.append(self._nodes_to_xml(node.childNodes))
                else:
                    parts.append(node.toxml())
        return "".join(parts)

    def _parse_table(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        footnotes: list[dict] = []
        if el.tagName in ("table", "index"):
            caption = self._extract_caption(doc, el)
            otsl_el = el
        else:
            footnotes = self._extract_footnotes(doc, el)
            otsl_el = self._first_child(el, "table") or self._first_child(el, "index")
            caption = self._extract_caption(doc, el)
            if caption is None and otsl_el is not None:
                caption = self._extract_caption(doc, otsl_el)
            if otsl_el is None:
                tbl = doc.add_table({"num_rows": 0, "num_cols": 0, "table_cells": []},
                                    caption=caption, parent=parent)
                tbl["footnotes"] = [{"$ref": f["self_ref"]} for f in footnotes]
                return
        label = "document_index" if otsl_el.tagName == "index" else M.TABLE

        head_nodes, body_nodes = self._split_head_body(otsl_el)
        provs = self._provs_from_nodes(doc, head_nodes)
        layer = None
        for n in head_nodes:
            if _is_el(n) and n.tagName == "layer" and n.getAttribute("value") in M.CONTENT_LAYERS:
                layer = n.getAttribute("value")
        thread_id = None
        for n in head_nodes:
            if _is_el(n) and n.tagName == "thread" and n.getAttribute("thread_id"):
                thread_id = n.getAttribute("thread_id")

        if thread_id and (existing := self._threads.get((thread_id, otsl_el.tagName))) is not None:
            # merge fragment: same-page fragments extend columns, cross-page rows
            data = existing.get("data") or {"num_rows": 0, "num_cols": 0, "table_cells": []}
            if existing.get("prov") and provs:
                last_page = existing["prov"][-1]["page_no"]
                if provs[0]["page_no"] == last_page:
                    row_offset, col_offset = 0, data.get("num_cols", 0)
                else:
                    row_offset, col_offset = data.get("num_rows", 0), 0
            else:
                row_offset = col_offset = 0
            existing.setdefault("prov", []).extend(provs)
            inner = self._nodes_to_xml(body_nodes)
            if inner.strip():
                frag = self._parse_otsl(f"<table>{inner}</table>", doc, existing,
                                        row_offset, col_offset)
                data["table_cells"].extend(frag["table_cells"])
                data["num_rows"] = max(data.get("num_rows", 0), row_offset + frag["num_rows"])
                data["num_cols"] = max(data.get("num_cols", 0), col_offset + frag["num_cols"])
                existing["data"] = data
            return

        inner = self._nodes_to_xml(body_nodes)
        tbl = doc.add_table({"num_rows": 0, "num_cols": 0, "table_cells": []},
                            caption=caption, parent=parent, label=label,
                            prov=[provs[0]] if provs else [])
        if layer:
            tbl["content_layer"] = layer
        tbl["data"] = self._parse_otsl(f"<table>{inner}</table>", doc, tbl)
        for p in provs[1:]:
            tbl["prov"].append(p)
        if thread_id:
            self._threads[(thread_id, otsl_el.tagName)] = tbl
        tbl["footnotes"] = [{"$ref": f["self_ref"]} for f in footnotes]

    def _parse_otsl(
        self, otsl_content: str, doc: Optional[Doc] = None, parent: Optional[dict] = None,
        row_offset: int = 0, col_offset: int = 0,
    ) -> dict:
        """OTSL token stream -> table data dict (reference doclang.py:1837-2047)."""
        el = parseString(otsl_content).documentElement
        parts: list[str] = []
        tokens: list[str] = []
        for node in el.childNodes:
            if isinstance(node, Text):
                if t := node.data.strip():
                    parts.append(t)
            elif _is_el(node):
                if node.tagName in _OTSL_TOKENS:
                    tok = f"<{node.tagName}/>"
                    tokens.append(tok)
                    parts.append(tok)
                else:
                    parts.append(node.toxml())

        nl = "<nl/>"
        origin_tokens = ["<fcel/>", "<ecel/>", "<ched/>", "<rhed/>", "<srow/>", "<corn/>"]
        cont_tokens = ["<lcel/>", "<ucel/>", "<xcel/>"]
        structural_no_corn = set(origin_tokens + cont_tokens + [nl]) - {"<corn/>"}
        split_rows = [list(g) for is_sep, g in groupby(tokens, key=lambda z: z == nl) if not is_sep]

        def count_right(c, r, which):
            span, j = 0, c
            while j < len(split_rows[r]) and split_rows[r][j] in which:
                j += 1
                span += 1
            return span

        def count_down(c, r, which):
            span, i = 0, r
            while i < len(split_rows) and c < len(split_rows[i]) and split_rows[i][c] in which:
                i += 1
                span += 1
            return span

        cells: list[dict] = []
        r_idx = c_idx = 0
        for i, t in enumerate(parts):
            if t in origin_tokens or t in cont_tokens:
                row_span = col_span = 1
                cell_bbox = None
                content_idx = i + 1
                cell_parts: list[str] = []
                if t != "<ecel/>" and content_idx < len(parts):
                    # leading per-cell location quartet
                    frags = []
                    j = content_idx
                    while j < len(parts) and parts[j].strip().startswith("<location"):
                        frags.append(parts[j])
                        j += 1
                        if len(frags) == 4:
                            vals = []
                            for frag in frags:
                                loc = parseString(frag).documentElement
                                try:
                                    vals.append(int(loc.getAttribute("value") or "0"))
                                except ValueError:
                                    vals.append(0)
                            cell_bbox = {
                                "l": float(min(vals[0], vals[2])),
                                "t": float(min(vals[1], vals[3])),
                                "r": float(max(vals[0], vals[2])),
                                "b": float(max(vals[1], vals[3])),
                                "coord_origin": "TOPLEFT",
                            }
                            content_idx = j
                            break
                    while content_idx < len(parts) and parts[content_idx] not in structural_no_corn:
                        cell_parts.append(parts[content_idx])
                        content_idx += 1
                cell_text = "".join(cell_parts)

                if not (t in cont_tokens and not cell_text.strip() and not cell_parts):
                    next_right = parts[content_idx] if content_idx < len(parts) else ""
                    next_bottom = (
                        split_rows[r_idx + 1][c_idx]
                        if (r_idx + 1) < len(split_rows) and c_idx < len(split_rows[r_idx + 1])
                        else ""
                    )
                    if next_right in ("<lcel/>", "<xcel/>"):
                        col_span += count_right(c_idx + 1, r_idx, ["<lcel/>", "<xcel/>"])
                    if next_bottom in ("<ucel/>", "<xcel/>"):
                        row_span += count_down(c_idx, r_idx + 1, ["<ucel/>", "<xcel/>"])

                    stripped = cell_text.strip()
                    xml_parts = [
                        p.strip() for p in cell_parts
                        if p.strip().startswith("<") and p.strip().endswith(">")
                    ]
                    cell: dict = {
                        "row_span": row_span,
                        "col_span": col_span,
                        "start_row_offset_idx": r_idx + row_offset,
                        "end_row_offset_idx": r_idx + row_span + row_offset,
                        "start_col_offset_idx": c_idx + col_offset,
                        "end_col_offset_idx": c_idx + col_span + col_offset,
                    }
                    if cell_bbox:
                        cell["bbox"] = cell_bbox
                    if xml_parts and doc is not None and parent is not None:
                        # rich cell: children dispatched under an anonymous group
                        cell_group = doc.add_group(parent=parent)
                        text_acc = []
                        for part in xml_parts:
                            root = parseString(f"<root>{part}</root>").documentElement
                            for child in root.childNodes:
                                if _is_el(child):
                                    self._dispatch(doc, child, cell_group)
                                    text_acc.append(self._get_text(child))
                        cell["text"] = "".join(text_acc).strip() or stripped
                        cell["ref"] = {"$ref": cell_group["self_ref"]}
                    else:
                        cell["text"] = stripped
                        cell["column_header"] = t in ("<ched/>", "<corn/>")
                        cell["row_header"] = t in ("<rhed/>", "<corn/>")
                        cell["row_section"] = t == "<srow/>"
                    cells.append(cell)
                c_idx += 1
            elif t == nl:
                r_idx += 1
                c_idx = 0

        return {
            "num_rows": len(split_rows),
            "num_cols": max((len(r) for r in split_rows), default=0),
            "table_cells": cells,
        }

    # -- pictures ---------------------------------------------------------------------------

    def _parse_picture(self, doc: Doc, el: Element, parent: Optional[dict]) -> None:
        footnotes: list[dict] = []
        if el.tagName == "picture":
            caption = self._extract_caption(doc, el)
            picture_el: Optional[Element] = el
        else:
            footnotes = self._extract_footnotes(doc, el)
            picture_el = self._first_child(el, "picture")
            caption = self._extract_caption(doc, el)
            if caption is None and picture_el is not None:
                caption = self._extract_caption(doc, picture_el)

        provs: list[dict] = []
        layer = None
        if picture_el is not None:
            provs = self._extract_provenance(doc, picture_el)
            layer = self._extract_layer(picture_el)
        pic = doc.add_picture(caption=caption, parent=parent,
                              prov=[provs[0]] if provs else [])
        if layer:
            pic["content_layer"] = layer
        for p in provs[1:]:
            pic["prov"].append(p)
        pic["footnotes"] = [{"$ref": f["self_ref"]} for f in footnotes]

        if picture_el is not None:
            if label_val := self._head_attr(picture_el, "label", "value"):
                if label_val not in (None, "undefined"):
                    pic.setdefault("meta", {})["classification"] = {
                        "predictions": [{"class_name": label_val, "confidence": 1.0}]
                    }
            self._apply_head_meta(pic, picture_el)
            _, body = self._split_head_body(picture_el)
            for node in body:
                if _is_el(node) and node.tagName == "src" and self._media_root is not None:
                    if uri := node.getAttribute("uri"):
                        if ref := self._image_ref_from_archive_uri(uri):
                            pic["image"] = ref
                    continue
                if _is_el(node) and node.tagName not in ("src", "tabular"):
                    self._dispatch(doc, node, pic)

    def _image_ref_from_archive_uri(self, uri: str) -> Optional[dict]:
        """Restore a relative <src uri> from an archive root (reference
        doclang.py:1556-1598; sizes come from image headers, not a decode)."""
        from pathlib import Path

        from docling_core_spark.sources.doclang_archive import _image_size

        uri = uri.strip()
        if not uri or uri.startswith("data:") or "://" in uri:
            return None
        root = Path(self._media_root).resolve()
        resolved = (root / uri).resolve()
        if not str(resolved).startswith(str(root)) or not resolved.is_file():
            return None
        data = resolved.read_bytes()
        size = _image_size(data)
        if size is None:
            return None
        import mimetypes

        return {
            "mimetype": mimetypes.guess_type(resolved.name)[0] or "image/png",
            "dpi": 72,
            "size": {"width": float(size[0]), "height": float(size[1])},
            "uri": str(resolved),
        }


def load_from_doclang(text: str, page_no: int = 1, media_root=None) -> Doc:
    """Parse DocLang XML into a Doc; media_root resolves relative <src> URIs
    (DocLang archive extraction root)."""
    return DocLangDeserializer(media_root=media_root).deserialize(text, page_no=page_no)
