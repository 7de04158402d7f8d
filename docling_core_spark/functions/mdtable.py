"""GitHub-flavored markdown table formatter.

Byte-compatible with ``tabulate(rows[1:], headers=rows[0], tablefmt="github",
disable_numparse=True, colalign=...)`` as used by the reference markdown
serializer (markdown.py:563-578), including:

- column width = max(max cell width, header width + 2)   [tabulate MIN_PADDING]
- separator row of plain dashes, width + 2, no alignment colons
- numeric columns (per tabulate ``_column_type`` over body rows) right-aligned,
  headers aligned like their column
- one space of padding on each side of every cell

Verified against the reference GT fixtures (e.g. 2206.01062.yaml.md tables,
barchart.gt.md right-aligned numeric columns).
"""

from __future__ import annotations

import math

_MIN_PADDING = 2


def _is_int_str(s: str) -> bool:
    try:
        int(s)
        return True
    except (ValueError, TypeError):
        return False


def _is_number_str(s: str) -> bool:
    try:
        v = float(s)
    except (ValueError, TypeError):
        return False
    if math.isinf(v) or math.isnan(v):
        return s.lower() in ("inf", "-inf", "nan")
    return True


_TYPE_RANK = {"none": 0, "bool": 1, "int": 2, "float": 3, "str": 5}


def _cell_type(s: str) -> str:
    # mirrors tabulate._type for string inputs
    if s is None:
        return "none"
    if s in ("True", "False"):
        return "bool"
    if _is_int_str(s):
        return "int"
    if _is_number_str(s):
        return "float"
    return "str"


def column_alignments(body_rows: list[list[str]], num_cols: int) -> list[str]:
    """Per-column 'left'/'right' as the reference computes via _column_type."""
    aligns = []
    for j in range(num_cols):
        rank = _TYPE_RANK["bool"]  # reduce(..., initial=bool)
        for row in body_rows:
            v = row[j] if j < len(row) else ""
            rank = max(rank, _TYPE_RANK[_cell_type(v)])
        aligns.append("right" if rank in (_TYPE_RANK["int"], _TYPE_RANK["float"]) else "left")
    return aligns


def format_github_table(rows: list[list[str]]) -> str:
    """Render rows (rows[0] = header) as a padded github markdown table."""
    if not rows:
        return ""
    header = rows[0]
    body = rows[1:]
    num_cols = len(header)
    aligns = column_alignments(body, num_cols) if body else ["left"] * num_cols

    widths = []
    for j in range(num_cols):
        w = len(header[j]) + _MIN_PADDING if j < len(header) else _MIN_PADDING
        for row in body:
            if j < len(row):
                w = max(w, len(row[j]))
        widths.append(w)

    def fmt_row(row: list[str]) -> str:
        cells = []
        for j in range(num_cols):
            v = row[j] if j < len(row) else ""
            cells.append(v.rjust(widths[j]) if aligns[j] == "right" else v.ljust(widths[j]))
        return "| " + " | ".join(cells) + " |"

    lines = [fmt_row(header)]
    lines.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for row in body:
        lines.append(fmt_row(row))
    return "\n".join(lines)
