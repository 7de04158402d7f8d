"""Page-layer types vs reference test vectors (reference test/test_page.py)."""

from __future__ import annotations

import math

import pytest

from docling_core_spark.model.page import (
    SegmentedPage,
    cell_to_bbox,
    pdf_page_geometry,
    rect_angle,
    rect_angle_360,
    rect_centre,
    rect_from_bbox,
    rect_to_bbox,
    rect_to_bottom_left_origin,
    rect_to_top_left_origin,
    rectangle,
    text_cell,
)

S = math.sqrt(2)


def _r(coords, origin):
    return rectangle(*coords, coord_origin=origin)


# the reference's 16 rotation vectors (test_page.py:12-215)
ANGLE_CASES = [
    (_r((0, 0, 1, 0, 1, 1, 0, 1), "BOTTOMLEFT"), 0.0, 0),
    (_r((0, 0, S / 2, S / 2, 0, S, -S / 2, S / 2), "BOTTOMLEFT"), math.pi / 4, 45),
    (_r((0, 0, 0, 1, -1, 1, -1, 0), "BOTTOMLEFT"), math.pi / 2, 90),
    (_r((0, 0, -S / 2, S / 2, -S, 0, -S / 2, -S / 2), "BOTTOMLEFT"), 3 * math.pi / 4, 135),
    (_r((0, 0, -0, 0, -1, -1, 0, -1), "BOTTOMLEFT"), math.pi, 180),
    (_r((0, 0, -S / 2, -S / 2, 0, -S, S / 2, -S / 2), "BOTTOMLEFT"), 5 * math.pi / 4, 225),
    (_r((0, 0, 0, -1, 1, -1, 1, 0), "BOTTOMLEFT"), 3 * math.pi / 2, 270),
    (_r((0, 0, S / 2, -S / 2, S, 0, S / 2, S / 2), "BOTTOMLEFT"), 7 * math.pi / 4, 315),
    (_r((0, 0, 1, 0, 1, 1, 0, 1), "TOPLEFT"), 0.0, 0),
    (_r((0, 0, S / 2, -S / 2, 0, -S, -S / 2, -S / 2), "TOPLEFT"), math.pi / 4, 45),
    (_r((0, 0, 0, -1, -1, -1, -1, 0), "TOPLEFT"), math.pi / 2, 90),
    (_r((0, 0, -S / 2, -S / 2, -S, 0, -S / 2, S / 2), "TOPLEFT"), 3 * math.pi / 4, 135),
    (_r((0, 0, -0, 0, -1, 1, 0, 1), "TOPLEFT"), math.pi, 180),
    (_r((0, 0, -S / 2, S / 2, 0, S, S / 2, S / 2), "TOPLEFT"), 5 * math.pi / 4, 225),
    (_r((0, 0, 0, 1, 1, 1, 1, 0), "TOPLEFT"), 3 * math.pi / 2, 270),
    (_r((0, 0, S / 2, S / 2, S, 0, S / 2, -S / 2), "TOPLEFT"), 7 * math.pi / 4, 315),
]


@pytest.mark.parametrize("rect,angle,angle360", ANGLE_CASES)
def test_bounding_rectangle_angle(rect, angle, angle360):
    assert rect_angle(rect) == pytest.approx(angle, abs=1e-6)
    assert rect_angle_360(rect) == pytest.approx(angle360, abs=1e-6)


def test_rect_bbox_roundtrip_and_centre():
    bb = {"l": 10.0, "b": 20.0, "r": 30.0, "t": 50.0, "coord_origin": "BOTTOMLEFT"}
    r = rect_from_bbox(bb)
    assert rect_to_bbox(r) == bb
    assert rect_centre(r) == (20.0, 35.0)


def test_origin_flips_are_inverse():
    r = rectangle(0, 0, 1, 0, 1, 1, 0, 1, coord_origin="BOTTOMLEFT")
    tl = rect_to_top_left_origin(r, page_height=100)
    assert tl["coord_origin"] == "TOPLEFT" and tl["r_y0"] == 100
    back = rect_to_bottom_left_origin(tl, page_height=100)
    assert back == r


def _page():
    dim = pdf_page_geometry(
        angle=0.0,
        rect=rect_from_bbox({"l": 0, "b": 0, "r": 100, "t": 200, "coord_origin": "BOTTOMLEFT"}),
    )
    cells = [
        text_cell(rect_from_bbox({"l": 0, "b": 190, "r": 20, "t": 200, "coord_origin": "BOTTOMLEFT"}),
                  "Hello", index=0, font_name="F1"),
        text_cell(rect_from_bbox({"l": 20, "b": 190, "r": 45, "t": 200, "coord_origin": "BOTTOMLEFT"}),
                  "World", index=1, font_name="F1"),
        text_cell(rect_from_bbox({"l": 0, "b": 0, "r": 30, "t": 10, "coord_origin": "BOTTOMLEFT"}),
                  "Footer", index=2, font_name="F1"),
    ]
    return SegmentedPage(dimension=dim, word_cells=cells)


def test_segmented_page_flags_and_dims():
    page = _page()
    assert page.has_words and not page.has_chars and not page.has_lines
    assert page.width == 100 and page.height == 200


def test_get_cells_in_bbox_origin_conversion():
    page = _page()
    # top-left query box covering the top strip (y 0..10 in TOPLEFT coords)
    got = page.get_cells_in_bbox(
        "word", {"l": 0, "t": 0, "r": 100, "b": 10, "coord_origin": "TOPLEFT"}
    )
    assert [c["text"] for c in got] == ["Hello", "World"]
    assert all(c["rect"]["coord_origin"] == "TOPLEFT" for c in got)
    assert cell_to_bbox(got[0])["t"] == 0  # converted into the query frame


def test_crop_text_adjacency():
    page = _page()
    out = page.crop_text("word", {"l": 0, "b": 150, "r": 100, "t": 200})
    assert out == "HelloWorld"  # adjacent cells stitch without a space
    out_all = page.crop_text("word", {"l": 0, "b": 0, "r": 100, "t": 200})
    assert out_all == "HelloWorld Footer"


def test_json_roundtrip(tmp_path):
    page = _page()
    path = tmp_path / "page.json"
    page.save_as_json(path)
    loaded = SegmentedPage.load_from_json(path)
    assert loaded.to_dict() == page.to_dict()
    assert loaded.has_words


def test_textlines_export():
    page = _page()
    lines = page.export_to_textlines("word", add_location=False)
    assert lines == [
        "        F1 left_to_right Hello",
        "        F1 left_to_right World",
        "        F1 left_to_right Footer",
    ]
    with_loc = page.export_to_textlines("word")[0]
    assert with_loc.startswith("(000.00, 190.00) ")


def test_iterate_cells_invalid_unit():
    with pytest.raises(ValueError):
        list(_page().iterate_cells("sentence"))
