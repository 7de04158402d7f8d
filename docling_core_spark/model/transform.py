"""Document-level transforms: page filter and concatenation.

Re-expresses the reference's ref-compaction algorithm (_DocIndex,
document.py:5255-5434): traversal-order re-index with page-delta shifting,
parent remap with ancestor fallback, floating-ref rewrite, rich-table-cell
ref rewrite, and name squeezing.  In Spark, concatenate runs under
``groupBy(doc_group).applyInPandas`` and filter as a per-row transform.
"""

from __future__ import annotations

import copy
import warnings
from typing import Optional, Sequence

from docling_core_spark.model import doc as M
from docling_core_spark.model.doc import Doc

_ITEM_KEYS = (
    "groups",
    "texts",
    "pictures",
    "tables",
    "key_value_items",
    "form_items",
    "field_regions",
    "field_items",
)


class _Reindexer:
    """Accumulates one or more docs into compacted, re-referenced arrays."""

    def __init__(self) -> None:
        self.body: Optional[dict] = None
        self.items: dict[str, list[dict]] = {k: [] for k in _ITEM_KEYS}
        self.pages: dict = {}
        self._max_page = 0
        self._names: list[str] = []

    def index(self, doc: Doc, page_nrs: Optional[set[int]] = None) -> None:
        doc_pages = {int(k) for k in doc.pages}
        if page_nrs is not None and (missing := page_nrs - doc_pages):
            raise ValueError(f"The following page numbers are not present in the document: {missing}")

        ref_map: dict[str, str] = {}
        page_delta = self._max_page - min(doc_pages) + 1 if doc_pages else 0

        if self.body is None:
            self.body = {k: copy.deepcopy(v) for k, v in doc.body.items() if k != "children"}
            self.body["children"] = []

        self._names.append(doc.name)
        start = {k: len(self.items[k]) for k in _ITEM_KEYS}

        for item, _ in doc.iterate_items(
            with_groups=True,
            traverse_pictures=True,
            included_content_layers=M.CONTENT_LAYERS,
            page_nrs=page_nrs,
        ):
            key = item["self_ref"].split("/")[1]
            is_body = key == "body"
            new_cref = "#/body" if is_body else f"#/{key}/{len(self.items[key])}"
            ref_map[item["self_ref"]] = new_cref
            if is_body:
                continue
            new_item = copy.deepcopy(item)
            new_item["children"] = []
            self.items[key].append(new_item)
            old_cref = new_item["self_ref"]
            new_item["self_ref"] = new_cref
            if M.is_doc_item(item):
                for prov in new_item.get("prov", ()):
                    prov["page_no"] = prov.get("page_no", 0) + page_delta
                for cell in (new_item.get("graph") or {}).get("cells", ()):
                    if cell.get("prov") is not None:
                        cell["prov"]["page_no"] = cell["prov"].get("page_no", 0) + page_delta
            if item.get("parent"):
                parent_cref = item["parent"]["$ref"]
                new_parent = ref_map.get(parent_cref)
                if new_parent is None:
                    walk = parent_cref
                    while new_parent is None and walk is not None:
                        parent_item = doc.resolve(walk)
                        pref = parent_item.get("parent")
                        walk = pref["$ref"] if pref else None
                        if walk is not None:
                            new_parent = ref_map.get(walk)
                    if new_parent is not None:
                        warnings.warn(
                            f"Parent {parent_cref} not found in indexed nodes, "
                            f"using ancestor {new_parent} instead"
                        )
                    else:
                        warnings.warn("No ancestor found in indexed nodes, using body as parent")
                        new_parent = "#/body"
                new_item["parent"] = {"$ref": new_parent}
                parts = new_parent.split("/")
                if len(parts) == 3:
                    parent_item = self.items[parts[1]][int(parts[2])]
                    if parts[1] == "tables":
                        for cell in (parent_item.get("data") or {}).get("table_cells", ()):
                            ref = cell.get("ref")
                            if ref and (ref["$ref"] if isinstance(ref, dict) else ref) == old_cref:
                                if isinstance(ref, dict):
                                    ref["$ref"] = new_cref
                                else:
                                    cell["ref"] = new_cref
                                break
                elif len(parts) == 2 and parts[1] == "body":
                    parent_item = self.body
                else:
                    raise RuntimeError(f"Unsupported ref format: {new_parent}")
                parent_item["children"].append({"$ref": new_cref})

        # rewrite floating refs for newly added items only
        for key in _ITEM_KEYS:
            for it in self.items[key][start[key]:]:
                for fld in ("captions", "references", "footnotes"):
                    if fld in it:
                        it[fld] = [
                            {"$ref": ref_map[r["$ref"]]}
                            for r in it[fld]
                            if r["$ref"] in ref_map
                        ]
                if "comments" in it:
                    # fine refs keep their extra keys (range spans)
                    it["comments"] = [
                        {**r, "$ref": ref_map[r["$ref"]]}
                        for r in it["comments"]
                        if r["$ref"] in ref_map
                    ]

        new_max = None
        for page_key, page in doc.pages.items():
            page_nr = int(page_key)
            if page_nrs is None or page_nr in page_nrs:
                new_page = copy.deepcopy(page)
                new_nr = page_nr + page_delta
                new_page["page_no"] = new_nr
                self.pages[str(new_nr)] = new_page
                if new_max is None or new_nr > new_max:
                    new_max = new_nr
        if new_max is not None:
            self._max_page = new_max

    def get_name(self) -> str:
        if not self._names:
            return ""
        squeezed = [self._names[0]]
        for n in self._names[1:]:
            if n != squeezed[-1]:
                squeezed.append(n)
        return " + ".join(squeezed)

    def build(self) -> Doc:
        out = Doc(name=self.get_name())
        if self.body is not None:
            out.body = self.body
        for k in _ITEM_KEYS:
            setattr(out, k, self.items[k])
        out.pages = self.pages
        return out


def filter_pages(doc: Doc, page_nrs: Optional[set[int]] = None) -> Doc:
    """New doc containing only the given pages, refs compacted (document.py:5417)."""
    rx = _Reindexer()
    rx.index(doc, page_nrs=page_nrs)
    out = rx.build()
    out.name = doc.name
    return out


def concatenate(docs: Sequence[Doc]) -> Doc:
    """Merge docs into one: re-indexed refs, shifted pages (document.py:5426)."""
    rx = _Reindexer()
    for d in docs:
        rx.index(d)
    return rx.build()
