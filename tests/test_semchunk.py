"""Behavior pins for the semchunk reimplementation
(docling_core_spark/functions/semchunk.py; reference hybrid_chunker.py:320-326
delegates plain-text splitting to the semchunk package)."""

from __future__ import annotations

from docling_core_spark.functions.semchunk import _split_text, semchunk_split


def _words(t: str) -> int:
    return len(t.split())


def test_splitter_hierarchy():
    assert _split_text("a\n\nb\nc")[0] == "\n\n"  # largest newline run wins
    assert _split_text("a\tb  c")[0] == "\t"
    assert _split_text("a  b c")[0] == "  "  # largest whitespace run
    assert _split_text("a.b,c")[0] == "."  # terminators before separators
    assert _split_text("a,b:c")[0] == ","
    assert _split_text("abc") == ("", True, ["a", "b", "c"])


def test_semantic_whitespace_refinement():
    """Single-space text with punctuation: split at whitespace *after* the
    punctuation, punctuation stays left, no leading space on the right —
    the boundary shape of every plain-text split in the reference chunker
    goldens (test/data/chunker/2a..2e_out_chunks.json)."""
    splitter, is_ws, splits = _split_text("One sentence. Another one, with clause. End")
    assert (splitter, is_ws) == (" ", True)
    assert splits == ["One sentence.", "Another one,", "with clause.", "End"]


def test_golden_style_sentence_boundaries():
    text = (
        "IBM was the leader in punch-card systems. During the 1960s, the "
        "mainframe was dominant. It sold the division to Lenovo in 2005."
    )
    out = semchunk_split(text, 8, _words)
    assert out == [
        "IBM was the leader in punch-card systems.",
        "During the 1960s, the mainframe was dominant.",
        "It sold the division to Lenovo in 2005.",
    ]
    assert all(_words(c) <= 8 for c in out)


def test_merge_to_budget():
    out = semchunk_split("The quick brown fox jumps over the lazy dog.", 4, _words)
    assert out == ["The quick brown fox", "jumps over the lazy", "dog."]


def test_paragraph_hierarchy_respected():
    text = "first paragraph here\n\nsecond one\n\nthird paragraph is a bit longer"
    out = semchunk_split(text, 6, _words)
    # paragraphs merge only along \n\n boundaries; nothing splits mid-paragraph
    assert out == ["first paragraph here\n\nsecond one", "third paragraph is a bit longer"]


def test_oversized_piece_recurses():
    text = "short one\n\n" + " ".join(["word"] * 20)
    out = semchunk_split(text, 6, _words)
    assert out[0] == "short one"
    assert all(_words(c) <= 6 for c in out)
    assert " ".join(out[1:]) == " ".join(["word"] * 20)


def test_character_fallback_and_punctuation_reattach():
    assert semchunk_split("abcdefgh", 3, len) == ["abc", "def", "gh"]
    # non-whitespace splitters reattach to the left chunk when they fit,
    # else they are emitted standalone
    assert semchunk_split("ab,cd", 3, len) == ["ab,", "cd"]
    assert semchunk_split("a,b,c,d,e", 3, len) == ["a,b", ",", "c,d", ",", "e"]


def test_empty_and_exact_fit():
    assert semchunk_split("fits entirely in budget", 10, _words) == [
        "fits entirely in budget"
    ]
    assert semchunk_split("", 5, _words) == []
