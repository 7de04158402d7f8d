"""Java/C/JS/TS code chunker golden parity (reference test_code_chunker.py,
repo specs with StandardCodeChunkingStrategy(max_tokens=5000)), plus the
hierarchical-chunker dispatch for the new languages."""

from __future__ import annotations

import hashlib
import json

import pytest

from docling_core_spark.functions.code_chunker_c import chunk_c_code
from docling_core_spark.functions.code_chunker_java import chunk_java_code
from docling_core_spark.functions.code_chunker_jsts import chunk_js_code, chunk_ts_code
from docling_core_spark.model.doc import parse_binary_hash

from .conftest import require_ref_data

_COMMIT = "abc123def456"

_DOC_ITEM = {
    "self_ref": "#/texts/0",
    "parent": {"$ref": "#/body"},
    "children": [],
    "content_layer": "body",
    "label": "code",
    "prov": [],
}

_SPECS = [
    ("Java", "acmeair", "https://github.com/acmeair/acmeair", chunk_java_code),
    ("C", "json-c", "https://github.com/json-c/json-c", chunk_c_code),
    ("JavaScript", "jquery", "https://github.com/jquery/jquery", chunk_js_code),
    ("TypeScript", "outline", "https://github.com/outline/outline", chunk_ts_code),
]


def _chunk_repo(repo: str, url: str, chunker) -> list[dict]:
    base = require_ref_data().parent / "data" / "chunker_repo" / "repos" / repo
    acts = []
    for f in sorted(base.iterdir()):
        content = f.read_text(encoding="utf-8")
        origin = {
            "mimetype": "text/plain",
            "binary_hash": parse_binary_hash(
                hashlib.sha256(content.encode("utf-8")).hexdigest()
            ),
            "filename": f.name,
            "uri": f"{url}/blob/{_COMMIT}/{f.name}",
        }
        acts.extend(chunker(content, doc_item=_DOC_ITEM, origin=origin))
    return acts


@pytest.mark.parametrize("lang,repo,url,chunker", _SPECS)
def test_repo_golden_parity(lang, repo, url, chunker):
    golden_path = (
        require_ref_data().parent / "data" / "chunker_repo" / lang / "repo_out_chunks.json"
    )
    golden = json.loads(golden_path.read_text())["root"]
    acts = _chunk_repo(repo, url, chunker)
    assert acts == golden


def test_hierarchical_dispatch_all_languages():
    """Code items route to the per-language chunkers; unknown languages fall
    back to a single code_block chunk (reference
    standard_code_chunking_strategy.py:29-35,83-94)."""
    from docling_core_spark.functions.chunkers import hierarchical_chunks
    from docling_core_spark.model.doc import Doc

    samples = {
        "Java": "public class A {\n\tpublic int f() {\n\t\treturn 1;\n\t}\n}\n",
        "C": "static int f(void)\n{\n\treturn 1;\n}\n",
        "JavaScript": "function f() {\n\treturn 1;\n}\n",
        "TypeScript": "function f(): number {\n\treturn 1;\n}\n",
        "unknown": "whatever text\n",
    }
    for lang, code in samples.items():
        doc = Doc(name="t")
        doc.add_code(text=code, code_language=lang)
        chunks = list(hierarchical_chunks(doc, code_chunking=True))
        assert chunks, lang
        if lang == "unknown":
            assert chunks[0]["meta"]["chunk_type"] == "code_block"
        else:
            assert chunks[0]["meta"]["chunk_type"] == "function"
            assert chunks[0]["meta"]["part_name"] == "f"


def test_synth_modules_deterministic_and_chunkable():
    """The driver-query synthesizers produce stable, chunkable modules."""
    from docling_core_spark.operators.doc_synth_ops import code_chunk_rows

    for lang in ("python", "java", "c", "ts"):
        rows1 = code_chunk_rows("doc-1", "alpha beta gamma delta", lang)
        rows2 = code_chunk_rows("doc-1", "alpha beta gamma delta", lang)
        assert rows1 == rows2
        kinds = {r["chunk_type"] for r in rows1}
        assert "function" in kinds, lang
        assert all(isinstance(r["chunk_text"], str) and r["chunk_text"] for r in rows1)
