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


# -- get_visualization_svg on the reference's own viz-test fixtures --
# (reference test_visualization.py pins PNGs for get_visualization; the SVG
# counterpart pins the same stacks on the shipped fixtures)


def test_get_visualization_svg_default_stack():
    d = _doc("2408.09869v3_enriched_p2_p3_p5.gt.json")
    viz = V.get_visualization_svg(d)
    assert viz[2] == (_SVG_DIR / "getviz_2408_p2.svg").read_text()
    MD.parseString(viz[2])
    # layout layer present (rects) and reading-order layer present (arrows)
    assert "<rect" in viz[2] and "<line" in viz[2]


def test_get_visualization_svg_no_label():
    d = _doc("2408.09869v3_enriched_p2_p3_p5.gt.json")
    viz = V.get_visualization_svg(d, show_label=False)
    assert viz[2] == (_SVG_DIR / "getviz_2408_nolabel_p2.svg").read_text()
    assert "<text" not in viz[2]


def test_get_visualization_svg_branch_numbering():
    d = _doc("cross_page_lists.json")
    viz = V.get_visualization_svg(d, show_branch_numbering=True)
    assert viz[1] == (_SVG_DIR / "getviz_crosspage_branchnum_p1.svg").read_text()
    assert viz[1].count("<circle") >= 1


def test_get_visualization_svg_key_value_mode():
    d = _doc("doc_with_kv.dt.json")
    viz = V.get_visualization_svg(d, viz_mode="key_value", show_cell_id=True)
    assert viz[1] == (_SVG_DIR / "getviz_kvmode_p1.svg").read_text()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        V.get_visualization_svg(d, viz_mode="nope")


def test_render_page_svg():
    """SegmentedPage rendering (reference page.py render_as_image -> SVG)."""
    from docling_core_spark.model import page as P

    dim = P.pdf_page_geometry(
        angle=0.0, rect=P.rectangle(0, 0, 612, 0, 612, 792, 0, 792, "BOTTOMLEFT")
    )
    cell_rect = P.rectangle(10, 760, 110, 760, 110, 780, 10, 780, "BOTTOMLEFT")
    res_rect = P.rectangle(200, 300, 300, 300, 300, 400, 200, 400, "BOTTOMLEFT")
    page = P.SegmentedPage(
        dimension=dim,
        word_cells=[P.text_cell(cell_rect, "hello", index=0)],
        bitmap_resources=[P.bitmap_resource(res_rect)],
        widgets=[P.pdf_widget(res_rect)],
        hyperlinks=[P.pdf_hyperlink(res_rect, uri="https://example.com")],
        shapes=[P.pdf_shape(0, [(10.0, 10.0), (50.0, 10.0), (50.0, 50.0), (10.0, 10.0)])],
    )
    svg = V.render_page_svg(page, cell_unit="word")
    MD.parseString(svg)
    assert svg.count('class="bitmap"') == 1
    assert svg.count('class="widget"') == 1
    assert svg.count('class="hyperlink"') == 1
    # closed shape renders as one filled polygon
    assert svg.count('class="shape"') == 1 and "<polygon" in svg
    # the word cell: top-left-origin polygon (792-780=12 top edge)
    assert 'class="cell"' in svg and "10,12" in svg
    # text mode swaps polygons for <text> at the cell centre
    svg_txt = V.render_page_svg(page, cell_unit="word", draw_cells_text=True)
    assert "hello" in svg_txt and 'class="cell"' not in svg_txt
    # open polyline shape renders as segments
    page2 = P.SegmentedPage(
        dimension=dim,
        shapes=[P.pdf_shape(0, [(10.0, 10.0), (50.0, 10.0), (50.0, 50.0)])],
    )
    svg2 = V.render_page_svg(page2)
    assert svg2.count("<line") == 2


def test_crafted_label_cannot_break_out_of_attributes():
    """An untrusted item label must not inject markup via class attributes
    or the label <text> body (quotes + angle brackets are escaped)."""
    d = _doc("2311.18481v1.json")
    evil = '"><script>alert(1)</script><rect class="'
    d.texts[1]["label"] = evil
    svg = V.layout_svg(d)[1]
    assert "<script" not in svg and evil not in svg
    # the escaped form is present instead, and the document still parses
    assert "&quot;&gt;&lt;script&gt;" in svg
    MD.parseString(svg)


def test_escape_covers_quotes():
    assert V._escape('a"b<c>&') == "a&quot;b&lt;c&gt;&amp;"
