"""Chunker parity vs reference chunker goldens + hybrid behavior tests."""

from __future__ import annotations

import json

import pytest

from docling_core_spark.functions.chunkers import (
    HybridChunker,
    RegexTokenizer,
    contextualize,
    hierarchical_chunks,
)
from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json, require_ref_data


def _chunk_proj(c: dict) -> dict:
    """Comparable projection of a chunk (text + lineage)."""
    return {
        "text": c["text"],
        "headings": c.get("headings"),
        "refs": [it["self_ref"] for it in c["doc_items"]],
        "origin_filename": (c.get("origin") or {}).get("filename"),
    }


def _gt_proj(c: dict) -> dict:
    meta = c["meta"]
    return {
        "text": c["text"],
        "headings": meta.get("headings"),
        "refs": [it["self_ref"] for it in meta["doc_items"]],
        "origin_filename": (meta.get("origin") or {}).get("filename"),
    }


def _shadowed_headings_doc() -> Doc:
    """Replica of the reference test doc (test_hybrid_chunker.py:450-461)."""
    doc = Doc(name="")
    doc.add_heading(text="Section 1", level=1)
    doc.add_heading(text="Section 1.1", level=2)
    doc.add_heading(text="Section 1.2", level=2)
    doc.add_heading(text="Section 2", level=1)
    doc.add_heading(text="Section 2.1", level=2)
    doc.add_heading(text="Section 2.1.1", level=3)
    doc.add_heading(text="Section 3", level=1)
    doc.add_heading(text="Section 3.1", level=2)
    doc.add_text("text", "Foo")
    doc.add_heading(text="Section 4", level=1)
    doc.add_heading(text="Section 4.1", level=2)
    return doc


@pytest.mark.parametrize(
    "inp,gt,kwargs",
    [
        ("0_inp_dl_doc.json", "0_out_chunks.json", {}),
        (None, "2h_out_chunks_hier_emit_false.json", dict(always_emit_headings=False)),
        (None, "2h_out_chunks_hier_emit_true.json", dict(always_emit_headings=True)),
    ],
)
def test_hierarchical_chunks_gt(inp, gt, kwargs):
    doc = Doc.from_dict(load_doc_json(f"chunker/{inp}")) if inp else _shadowed_headings_doc()
    actual = [_chunk_proj(c) for c in hierarchical_chunks(doc, **kwargs)]
    expected_raw = json.loads((require_ref_data() / "chunker" / gt).read_text())
    expected = [_gt_proj(c) for c in expected_raw["root"]]
    assert len(actual) == len(expected), (
        f"{len(actual)} chunks vs {len(expected)} expected\n"
        + "\n".join(f"A: {a['text'][:60]!r}" for a in actual[:10])
        + "\n"
        + "\n".join(f"E: {e['text'][:60]!r}" for e in expected[:10])
    )
    for i, (a, e) in enumerate(zip(actual, expected)):
        assert a == e, f"chunk {i}:\nactual : {a}\nexpect : {e}"


def test_contextualize_headings():
    c = {"text": "body text", "headings": ["H1", "H2"], "doc_items": []}
    assert contextualize(c) == "H1\nH2\nbody text"


def test_hybrid_respects_max_tokens():
    data = load_doc_json("chunker/0_inp_dl_doc.json")
    doc = Doc.from_dict(data)
    tok = RegexTokenizer(64)
    chunker = HybridChunker(tokenizer=tok)
    chunks = chunker.chunk(doc)
    assert chunks
    from docling_core_spark.model import doc as M

    for c in chunks:
        is_table = len(c["doc_items"]) == 1 and M.is_table_item(c["doc_items"][0])
        if is_table:
            # table path budgets on chunk text only (reference LineBasedTokenChunker
            # ignores heading overhead — same contract here)
            n = tok.count_tokens(c["text"])
        else:
            n = tok.count_tokens(contextualize(c))
        assert n <= 64, f"{n} tokens (table={is_table}): {c['text'][:80]!r}"


def test_hybrid_merges_peers():
    data = load_doc_json("chunker/0_inp_dl_doc.json")
    doc = Doc.from_dict(data)
    merged = HybridChunker(tokenizer=RegexTokenizer(512), merge_peers=True).chunk(doc)
    unmerged = HybridChunker(tokenizer=RegexTokenizer(512), merge_peers=False).chunk(doc)
    assert len(merged) <= len(unmerged)
    # content is preserved modulo the merge delimiter
    assert "".join(c["text"] for c in merged).replace("\n", "") == "".join(
        c["text"] for c in unmerged
    ).replace("\n", "")


def test_chunk_expanders():
    from docling_core_spark.functions.chunkers import expand_chunk_page, expand_chunk_tree

    doc = Doc.from_dict(load_doc_json("chunker/0_inp_dl_doc.json"))
    chunks = list(hierarchical_chunks(doc))
    c = chunks[5]
    tree = expand_chunk_tree(c, doc)
    assert c["text"][:40] in tree["text"]
    assert len(tree["doc_items"]) >= len(c["doc_items"])
    page = expand_chunk_page(c, doc)
    assert len(page["text"]) >= len(c["text"])
    # every original item's page is covered by the expansion
    pages_orig = {p["page_no"] for it in c["doc_items"] for p in it.get("prov", ())}
    pages_exp = {p["page_no"] for it in page["doc_items"] for p in it.get("prov", ())}
    assert pages_orig <= pages_exp


def test_page_chunks():
    from docling_core_spark.functions.chunkers import page_chunks

    doc = Doc.from_dict(load_doc_json("chunker/0_inp_dl_doc.json"))
    chunks = list(page_chunks(doc))
    assert len(chunks) == len(doc.pages)
    assert [c["page_no"] for c in chunks] == sorted(int(k) for k in doc.pages)


def test_hybrid_table_header_repetition():
    doc = Doc(name="t")
    cells = []
    for j, h in enumerate(["col_a", "col_b"]):
        cells.append(
            dict(
                start_row_offset_idx=0,
                end_row_offset_idx=1,
                start_col_offset_idx=j,
                end_col_offset_idx=j + 1,
                text=h,
                column_header=True,
            )
        )
    for i in range(1, 30):
        for j in range(2):
            cells.append(
                dict(
                    start_row_offset_idx=i,
                    end_row_offset_idx=i + 1,
                    start_col_offset_idx=j,
                    end_col_offset_idx=j + 1,
                    text=f"value_{i}_{j}",
                )
            )
    doc.add_table(data=dict(num_rows=30, num_cols=2, table_cells=cells))
    # markdown table serializer (not triplet) to exercise header repetition:
    from docling_core_spark.functions.serializers import DocSerializer, MarkdownParams

    class MDProviderChunker(HybridChunker):
        pass

    chunker = HybridChunker(tokenizer=RegexTokenizer(60), repeat_table_header=True)
    # triplet tables don't have header/sep lines; build chunk manually via md table
    md = DocSerializer(doc, MarkdownParams()).serialize().text
    chunk = {"text": md, "doc_items": [doc.tables[0]], "headings": None, "origin": None}
    ser = DocSerializer(doc, MarkdownParams())
    out = chunker._split_using_plain_text(chunk, ser)
    assert len(out) > 1
    header_line = md.splitlines()[0]
    for seg in out:
        assert seg["text"].splitlines()[0] == header_line


# ---------------------------------------------------------------------------
# LineBasedTokenChunker (exact port of reference line_chunker.py:20-340)
# ---------------------------------------------------------------------------


class _WordTok:
    """Mock tokenizer: 1 token per whitespace-separated word."""

    def __init__(self, max_tokens: int):
        self._max = max_tokens

    def count_tokens(self, text: str) -> int:
        return len(text.split())

    def get_max_tokens(self) -> int:
        return self._max


def test_line_chunker_packs_lines_with_prefix():
    from docling_core_spark.functions.chunkers import LineBasedTokenChunker

    ck = LineBasedTokenChunker(_WordTok(6), prefix="H1 H2\n")
    lines = ["a b c\n", "d e\n", "f g h i\n"]
    out = ck.chunk_text(lines)
    # prefix(2)+line1(3)=5; line2 would make 7>6 -> flush; prefix+line2=4;
    # line3(4) would make 8>6 -> flush; prefix+line3=6 fits exactly
    assert out == ["H1 H2\na b c\n", "H1 H2\nd e\n", "H1 H2\nf g h i\n"]
    assert all(c.startswith("H1 H2\n") for c in out)


def test_line_chunker_splits_oversized_line_with_word_boundary():
    from docling_core_spark.functions.chunkers import LineBasedTokenChunker

    ck = LineBasedTokenChunker(_WordTok(4), prefix="")
    out = ck.chunk_text(["w1 w2 w3 w4 w5 w6 w7"])
    assert len(out) == 2
    # every piece respects the budget and splits on a word boundary
    assert all(len(c.split()) <= 4 for c in out)
    assert "".join(out).replace("\n", " ").split() == [f"w{i}" for i in range(1, 8)]


def test_line_chunker_split_by_token_limit_snaps_to_space():
    from docling_core_spark.functions.chunkers import LineBasedTokenChunker

    ck = LineBasedTokenChunker(_WordTok(100))
    head, tail = ck.split_by_token_limit("alpha beta gamma delta", 2)
    assert head == "alpha beta"
    assert tail == " gamma delta"
    head, tail = ck.split_by_token_limit("short", 2)
    assert (head, tail) == ("short", "")
    head, tail = ck.split_by_token_limit("anything", 0)
    assert (head, tail) == ("", "anything")


def test_line_chunker_prefix_longer_than_budget_is_standalone():
    from docling_core_spark.functions.chunkers import LineBasedTokenChunker

    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        ck = LineBasedTokenChunker(_WordTok(3), prefix="p1 p2 p3 p4 p5\n")
    assert ck.prefix_len == 0
    out = ck.chunk_text(["a b\n"])
    # prefix emitted as leading standalone chunks, then unprefixed content
    assert out[-1] == "a b\n"
    assert "".join(out[:-1]).replace("\n", " ").split() == ["p1", "p2", "p3", "p4", "p5"]


def test_line_chunker_omit_prefix_on_overflow():
    from docling_core_spark.functions.chunkers import LineBasedTokenChunker

    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        ck = LineBasedTokenChunker(
            _WordTok(5), prefix="h1 h2\n", omit_prefix_on_overflow=True
        )
        # 4-word line fits alone (4 <= 5) but not with the 2-token prefix
        out = ck.chunk_text(["w1 w2 w3 w4\n", "a b\n"])
    assert out[0] == "h1 h2\n"  # prefix stays visible as its own chunk
    assert out[1].startswith("w1 w2 w3 w4")


def test_hybrid_table_split_repeats_header_exactly():
    """Table rows overflow -> every segment re-carries the header rows."""
    from docling_core_spark.functions.chunkers import HybridChunker
    from docling_core_spark.model.doc import Doc

    doc = Doc("t")
    rows = [["h1", "h2"]] + [[f"r{i}a", f"r{i}b"] for i in range(12)]
    cells = []
    for i, row in enumerate(rows):
        for j, txt in enumerate(row):
            cells.append(
                {
                    "text": txt,
                    "start_row_offset_idx": i,
                    "end_row_offset_idx": i + 1,
                    "start_col_offset_idx": j,
                    "end_col_offset_idx": j + 1,
                    "column_header": i == 0,
                }
            )
    doc.add_table({"num_rows": len(rows), "num_cols": 2, "table_cells": cells})
    # markdown-table chunking serializer (reference
    # CompactMarkdownSerializerProvider equivalent) activates header repetition
    chunks = HybridChunker(
        tokenizer=_WordTok(30), serializer_overrides={"table_mode": "github"}
    ).chunk(doc)
    assert len(chunks) > 1
    for c in chunks:
        lines = c["text"].splitlines()
        assert "h1" in lines[0] and "h2" in lines[0], c["text"][:120]
        assert set(lines[1].replace("|", "").strip()) <= {"-", " "}  # separator row


def test_hybrid_chunk_2f_merge_only():
    """2f golden (reference test_chunk_openai): a 128k token budget never
    splits, so the output is tokenizer-independent peer merging."""
    doc = Doc.from_dict(load_doc_json("chunker/2_inp_dl_doc.json"))
    chunks = HybridChunker(tokenizer=RegexTokenizer(128 * 1024)).chunk(doc)
    expected = json.loads(
        (require_ref_data() / "chunker" / "2f_out_chunks.json").read_text()
    )["root"]
    assert [_chunk_proj(c) for c in chunks] == [_gt_proj(c) for c in expected]


def test_chunk_single_cell_rich_table():
    """A layout table whose only cell is a rich ref chunks to the inner text
    with the table as lineage (reference test_chunk_single_cell_rich_table)."""
    doc = Doc(name="single_cell_rich_table")
    table = doc.add_table(data={"table_cells": [], "num_rows": 1, "num_cols": 1})
    wrapper = doc.add_group(parent=table)
    doc.add_text("text", "Important body text inside layout table", parent=wrapper)
    doc.add_table_cell(table, {
        "start_row_offset_idx": 0, "end_row_offset_idx": 1,
        "start_col_offset_idx": 0, "end_col_offset_idx": 1,
        "ref": {"$ref": wrapper["self_ref"]}, "text": "",
    })
    chunks = HybridChunker(tokenizer=RegexTokenizer(64)).chunk(doc)
    assert len(chunks) == 1
    assert chunks[0]["text"] == "Important body text inside layout table"
    assert [it["self_ref"] for it in chunks[0]["doc_items"]] == ["#/tables/0"]


@pytest.mark.parametrize(
    "emit,gt",
    [(False, "2h_out_chunks_hybr_emit_false.json"),
     (True, "2h_out_chunks_hybr_emit_true.json")],
)
def test_hybrid_emit_headings_goldens(emit, gt):
    """Hybrid always_emit_headings over the shadowed-headings doc is
    tokenizer-independent (nothing exceeds any budget)."""
    chunks = HybridChunker(
        tokenizer=RegexTokenizer(512), always_emit_headings=emit
    ).chunk(_shadowed_headings_doc())
    expected = json.loads((require_ref_data() / "chunker" / gt).read_text())["root"]
    assert [_chunk_proj(c) for c in chunks] == [_gt_proj(c) for c in expected]
