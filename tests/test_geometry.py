"""Geometry algebra + regions->table induction (mirrors test_regions_to_table)."""

from __future__ import annotations

from docling_core_spark.functions.geometry import (
    bbox,
    dedupe_bboxes,
    enclosing_bbox,
    intersection_over_self,
    iou,
    table_from_regions,
)


def test_regions_to_table_convert():
    table_bbox = bbox(0, 0, 100, 175)
    rows = [
        bbox(1, 1, 99, 25),
        bbox(1, 25, 99, 50),
        bbox(1, 50, 99, 75),
        bbox(1, 75, 99, 99),
        bbox(1, 100, 99, 149),
        bbox(1, 150, 99, 175),
    ]
    cols = [
        bbox(1, 1, 25, 149),
        bbox(25, 1, 50, 149),
        bbox(50, 1, 75, 149),
        bbox(75, 1, 99, 149),
    ]
    merges = [bbox(0, 0, 50, 25), bbox(50, 0, 99, 25)]
    col_headers = [bbox(0, 0, 99, 25)]
    row_headers = [bbox(0, 0, 50, 150)]
    row_section = [bbox(1, 75, 99, 99)]

    td = table_from_regions(
        table_bbox,
        rows,
        cols,
        merges,
        row_headers=row_headers,
        col_headers=col_headers,
        row_sections=row_section,
    )
    assert td["num_cols"] == 4
    assert td["num_rows"] == 6
    c0 = td["table_cells"][0]
    assert (c0["bbox"]["l"], c0["bbox"]["t"], c0["bbox"]["r"], c0["bbox"]["b"]) == (1.0, 1.0, 50.0, 25.0)
    assert c0["col_span"] == 2 and c0["column_header"]
    assert td["table_cells"][1]["column_header"]
    assert td["table_cells"][10]["row_header"]
    assert td["table_cells"][12]["row_section"]
    c17 = td["table_cells"][17]
    assert (c17["bbox"]["l"], c17["bbox"]["t"], c17["bbox"]["r"], c17["bbox"]["b"]) == (75.0, 100.0, 99.0, 149.0)


def test_degenerate_regions_fallback():
    td = table_from_regions(bbox(0, 0, 10, 10), [], [], [])
    assert td["num_rows"] == 1 and td["num_cols"] == 1
    assert td["table_cells"][0]["bbox"] == bbox(0, 0, 10, 10)


def test_bbox_algebra():
    a, b = bbox(0, 0, 10, 10), bbox(5, 5, 15, 15)
    assert iou(a, b) == 25 / 175
    assert intersection_over_self(a, b) == 0.25
    enc = enclosing_bbox([a, b])
    assert (enc["l"], enc["t"], enc["r"], enc["b"]) == (0, 0, 15, 15)
    assert len(dedupe_bboxes([a, bbox(0, 0, 10, 10.1), b])) == 2
