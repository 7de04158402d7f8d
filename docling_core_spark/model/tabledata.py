"""TableData row manipulation (reference items/table/table_data.py:144-292).

Operates on the dict table data model ``{"table_cells": [...], "num_rows",
"num_cols"}``.  Row inserts and removals renumber every cell's row offsets
from its flat index (the reference assumes a dense one-cell-per-position
grid for these ops); removed rich-cell refs are deleted from the owning
document when one is provided.
"""

from __future__ import annotations

from typing import Optional

from docling_core_spark.model.doc import Doc


def _renumber_rows(data: dict) -> None:
    num_cols = data["num_cols"]
    for index, cell in enumerate(data["table_cells"]):
        row = index // num_cols
        cell["start_row_offset_idx"] = row
        cell["end_row_offset_idx"] = row + 1
    data.pop("grid", None)  # computed grid is stale after any row change


def insert_row(data: dict, row_index: int, row: list[str], after: bool = False) -> None:
    """Insert one row of plain text cells before/after row_index."""
    num_cols = data["num_cols"]
    if len(row) != num_cols:
        raise ValueError(
            f"Row length {len(row)} does not match the number of columns {num_cols}."
        )
    effective = row_index + (1 if after else 0)
    if effective < 0 or effective > data["num_rows"]:
        raise IndexError(
            f"Row index {row_index} is out of bounds for the current number of rows "
            f"{data['num_rows']}."
        )
    new_cells = [
        {
            "text": text,
            "start_row_offset_idx": effective,
            "end_row_offset_idx": effective + 1,
            "start_col_offset_idx": j,
            "end_col_offset_idx": j + 1,
        }
        for j, text in enumerate(row)
    ]
    cells = data["table_cells"]
    data["table_cells"] = (
        cells[: effective * num_cols] + new_cells + cells[effective * num_cols :]
    )
    data["num_rows"] += 1
    _renumber_rows(data)


def insert_rows(data: dict, row_index: int, rows: list[list[str]], after: bool = False) -> None:
    """Insert several rows at one index, preserving their order."""
    for row in rows[::-1]:
        insert_row(data, row_index, row, after)


def add_row(data: dict, row: list[str]) -> None:
    """Append one row at the bottom."""
    insert_row(data, data["num_rows"] - 1, row, after=True)


def add_rows(data: dict, rows: list[list[str]]) -> None:
    """Append several rows at the bottom."""
    for row in rows:
        add_row(data, row)


def remove_rows(data: dict, indices: list[int], doc: Optional[Doc] = None) -> list[list[dict]]:
    """Remove rows by index (processed descending); rich-cell targets are
    deleted from doc when given."""
    if not indices:
        return []
    refs_to_remove = []
    all_removed = []
    for row_index in sorted(indices, reverse=True):
        if row_index < 0 or row_index >= data["num_rows"]:
            raise IndexError(
                f"Row index {row_index} is out of bounds for the current number of "
                f"rows {data['num_rows']}."
            )
        num_cols = data["num_cols"]
        start = row_index * num_cols
        removed = data["table_cells"][start : start + num_cols]
        for cell in removed:
            if cell.get("ref"):
                refs_to_remove.append(cell["ref"])
        data["table_cells"] = data["table_cells"][:start] + data["table_cells"][start + num_cols :]
        data["num_rows"] -= 1
        _renumber_rows(data)
        all_removed.append(removed)
    if refs_to_remove and doc is not None:
        from docling_core_spark.model.mutate import delete_items

        delete_items(
            doc,
            [doc.resolve(r["$ref"] if isinstance(r, dict) else r) for r in refs_to_remove],
        )
    return all_removed


def remove_row(data: dict, row_index: int, doc: Optional[Doc] = None) -> list[dict]:
    """Remove one row by index."""
    return remove_rows(data, [row_index], doc=doc)[0]


def pop_row(data: dict, doc: Optional[Doc] = None) -> list[dict]:
    """Remove and return the last row."""
    if data["num_rows"] == 0:
        raise IndexError("Cannot pop from an empty table.")
    return remove_row(data, data["num_rows"] - 1, doc=doc)
