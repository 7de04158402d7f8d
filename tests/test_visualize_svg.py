"""SVG visualizer goldens + geometry checks (reference
transforms/visualizer/*.py re-expressed as SVG; see
functions/visualize_svg.py for the documented PNG->SVG deviations)."""

from __future__ import annotations

import xml.dom.minidom as MD
from pathlib import Path

from docling_core_spark.functions import visualize_svg as V
from docling_core_spark.model.doc import Doc

from .conftest import require_ref_data

_SVG_DIR = Path(__file__).parent / "data" / "svg"


def _doc(name: str) -> Doc:
    path = require_ref_data().parent / "data" / "doc" / name
    return Doc.from_json(path.read_text())


def test_layout_svg_golden():
    d = _doc("2311.18481v1.json")
    svg = V.layout_svg(d)[1]
    assert svg == (_SVG_DIR / "layout_2311_p1.svg").read_text()
    MD.parseString(svg)


def test_reading_order_svg_golden():
    d = _doc("2311.18481v1.json")
    svg = V.reading_order_svg(d)[1]
    assert svg == (_SVG_DIR / "reading_order_2311_p1.svg").read_text()
    # n elements on a single path -> n-1 arrows, each with a head
    assert svg.count("<line") == svg.count("<polygon")


def test_table_svg_golden():
    d = _doc("2311.18481v1.json")
    svg = V.table_svg(d, show_rows=True, show_cols=True)[1]
    assert svg == (_SVG_DIR / "table_2311_p1.svg").read_text()


def test_key_value_svg_golden():
    d = _doc("doc_with_kv.dt.json")
    svg = V.key_value_svg(d)[1]
    assert svg == (_SVG_DIR / "kv_doc_with_kv_p1.svg").read_text()
    # every to_value link draws a shaft and an arrow head
    n_links = sum(
        1
        for kv in d.key_value_items
        for ln in kv["graph"]["links"]
        if ln["label"] == "to_value"
    )
    assert svg.count("<line") == n_links == svg.count("<polygon")


def test_stacked_svg_golden():
    d = _doc("2311.18481v1.json")
    svg = V.visualize_doc_svg(d)[2]
    assert svg == (_SVG_DIR / "stacked_2311_p2.svg").read_text()
    MD.parseString(svg)


def test_layout_rect_matches_bbox_math():
    """The rect coordinates are exactly the top-left-origin prov bbox."""
    d = _doc("2311.18481v1.json")
    item = d.texts[1]
    prov = item["prov"][0]
    page = d.pages[str(prov["page_no"])] if str(prov["page_no"]) in d.pages else d.pages[prov["page_no"]]
    page_h = page["size"]["height"]
    bb = prov["bbox"]
    x0 = bb["l"]
    y0 = page_h - bb["t"]  # BOTTOMLEFT -> TOPLEFT
    svg = V.layout_svg(d)[prov["page_no"]]
    assert f'x="{V._fmt(x0)}" y="{V._fmt(y0)}"' in svg


def test_arrow_head_geometry():
    """Arrowhead points replicate the reference math (length 20, width 10)."""
    pts = V._arrow_head(0.0, 0.0, 100.0, 0.0, 20, 10)
    (tip, left, right) = pts
    assert tip == (100.0, 0.0)
    # base is ~20 units before the tip along the shaft, +-10 perpendicular
    assert abs(left[0] - 80.0) < 0.01 and abs(left[1] - 10.0) < 0.01
    assert abs(right[0] - 80.0) < 0.01 and abs(right[1] + 10.0) < 0.01


def test_row_col_bboxes_minimal_and_uniform():
    d = _doc("2311.18481v1.json")
    data = d.tables[0]["data"]
    rows_min = V.row_bounding_boxes(data, minimal=True)
    rows_uni = V.row_bounding_boxes(data, minimal=False)
    assert rows_min and set(rows_min) == set(rows_uni)
    # uniform rows all share l/r
    ls = {b["l"] for b in rows_uni.values()}
    rs = {b["r"] for b in rows_uni.values()}
    assert len(ls) == 1 and len(rs) == 1
    cols = V.column_bounding_boxes(data, minimal=True)
    assert cols
    # each row bbox encloses its cells
    for idx, bb in rows_min.items():
        for cell in data["table_cells"]:
            if cell.get("bbox") and cell["start_row_offset_idx"] <= idx < cell["end_row_offset_idx"]:
                assert bb["l"] <= cell["bbox"]["l"] + 1e-9
                assert bb["r"] >= cell["bbox"]["r"] - 1e-9
