"""Profile / time the pure-python full-format row path (the Spark stage's
per-row work): parse + markdown + text + html + doctags + doclang + chunks
over 500 synthesized pages from sf0.001 documents.

    python scripts/profile_fullformat.py          # timing only (best of 3)
    python scripts/profile_fullformat.py profile  # cProfile top-40

Same workload as BENCH/AB_FULLFORMAT_R{6,7}.md.
"""

from __future__ import annotations

import sys
import time

import duckdb

from docling_core_spark.operators.extract import extract_row
from docling_core_spark.sources.web_pages import synth_rows

N_DOCS = 500


def load_pages():
    rows = duckdb.sql(
        "select doc_id, text, lang from "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        f"order by doc_id limit {N_DOCS}"
    ).fetchall()
    return list(
        synth_rows([r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows])
    )


def run(pages) -> float:
    t0 = time.perf_counter()
    for p in pages:
        extract_row(
            p["url"],
            p["html"],
            p["lang"],
            chunker="hybrid",
            emit_doc_json=True,
            emit_html=True,
            emit_doctags=True,
            emit_doclang=True,
        )
    return time.perf_counter() - t0


def main() -> None:
    pages = load_pages()
    run(pages[:50])  # warm imports/regex caches
    if len(sys.argv) > 1 and sys.argv[1] == "profile":
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run(pages)
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("tottime").print_stats(40)
        print("total calls:", st.total_calls)
    else:
        best = min(run(pages) for _ in range(3))
        print(f"best-of-3: {best:.3f} s  ({N_DOCS / best:.0f} docs/s single-core)")


if __name__ == "__main__":
    main()
