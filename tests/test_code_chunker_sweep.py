"""No-crash robustness sweep for the code chunkers: real source files beyond
the goldens (the reference package's own .py files, read as data), and
truncated/partial variants of every golden-repo file — per-row executor
isolation catches exceptions, but the parsers shouldn't throw on the long
tail of real code in the first place."""

from __future__ import annotations

import pytest

from docling_core_spark.functions.code_chunker import chunk_python_code
from docling_core_spark.functions.code_chunker_c import chunk_c_code
from docling_core_spark.functions.code_chunker_java import chunk_java_code
from docling_core_spark.functions.code_chunker_jsts import chunk_js_code, chunk_ts_code

from .conftest import require_ref_data


def test_python_chunker_sweep_reference_sources():
    pkg = require_ref_data().parent.parent / "docling_core"
    files = sorted(pkg.rglob("*.py"))[:25]
    assert len(files) >= 20
    total = 0
    for f in files:
        chunks = list(chunk_python_code(f.read_text(encoding="utf-8")))
        for c in chunks:
            assert isinstance(c["text"], str)
            assert c["meta"]["start_line"] >= 0
        total += len(chunks)
    assert total > 50


_REPOS = [
    ("acmeair", "*.java", chunk_java_code),
    ("json-c", "*.c", chunk_c_code),
    ("jquery", "*.js", chunk_js_code),
    ("outline", "*.ts", chunk_ts_code),
]


@pytest.mark.parametrize("repo,pattern,chunker", _REPOS)
def test_truncated_inputs_never_crash(repo, pattern, chunker):
    base = require_ref_data().parent / "data" / "chunker_repo" / "repos" / repo
    for f in sorted(base.glob(pattern)):
        code = f.read_text(encoding="utf-8")
        for frac in (0.8, 0.5, 0.23, 0.07):
            cut = code[: int(len(code) * frac)]
            chunks = list(chunker(cut))
            for c in chunks:
                assert isinstance(c["text"], str)


_GARBAGE = [
    "class {", "} } }", "((((((", "`${`${`${", "/* unterminated", '"unterminated',
    "#define", "import", "enum E {", "a\x00b", "@" * 50, "< < < >", "${}",
    "struct ;;; (", "function (", "export default", "typedef", "#if\n#if\n#endif",
    "e" * 10000, "{" * 500 + "}" * 499, "@", "typedef ", "#define X(",
]


@pytest.mark.parametrize("chunker", [chunk_java_code, chunk_c_code, chunk_js_code, chunk_ts_code])
def test_garbage_inputs_never_crash(chunker):
    for g in _GARBAGE:
        list(chunker(g))


def test_fuzz_random_text_never_crashes():
    """Hypothesis fuzz: arbitrary printable text must neither crash nor hang
    any of the four parsers (per-row isolation catches exceptions on the
    executor, but a parser loop would wedge the whole task)."""
    from hypothesis import given, settings, strategies as st

    alphabet = st.sampled_from(list("abc_ {}()<>[];:=.,*#@/\\'\"`$\n\t0123456789"))

    @settings(max_examples=120, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=120))
    def run(code):
        for fn in (chunk_java_code, chunk_c_code, chunk_js_code, chunk_ts_code):
            for c in fn(code):
                assert isinstance(c["text"], str)

    run()
