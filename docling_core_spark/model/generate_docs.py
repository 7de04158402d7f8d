"""Schema-documentation generator: export the document model's JSON Schema
to a docs folder (parity surface for the reference's
utils/generate_docs.py:1-74, built on this package's own schema emitter).

Usage:
    python -m docling_core_spark.model.generate_docs /tmp/docs [--clean]
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

from docling_core_spark.model.schema import document_json_schema

# the one collection model the reference documents (utils/generate_docs.py:17)
MODELS = ["DoclingDocument"]


def prepare_directory(folder: str, clean: bool = False) -> None:
    """Ensure ``folder`` exists; with ``clean`` remove its current content."""
    path = Path(folder)
    if path.is_dir():
        if clean:
            for child in list(path.iterdir()):
                if child.is_dir():
                    shutil.rmtree(child)
                else:
                    child.unlink()
    else:
        path.mkdir(parents=True, exist_ok=True)


def generate_collection_jsonschema(folder: str) -> list[Path]:
    """Write ``<Model>.json`` (ensure_ascii=False, indent=2 — the reference's
    serialization, utils/generate_docs.py:46-49) per documented model."""
    written = []
    for model in MODELS:
        out = Path(folder) / f"{model}.json"
        out.write_text(
            json.dumps(document_json_schema(), ensure_ascii=False, indent=2),
            encoding="utf-8",
        )
        written.append(out)
    return written


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("directory", help="output directory for the schema docs")
    parser.add_argument(
        "--clean",
        action=argparse.BooleanOptionalAction,
        default=False,
        help="remove existing directory content first",
    )
    args = parser.parse_args()
    prepare_directory(args.directory, args.clean)
    generate_collection_jsonschema(args.directory)


if __name__ == "__main__":
    main()
