"""End-to-end Spark pipeline tests at sf0.001 (500 pages).

The correctness invariant (north rule): the distributed output is
byte-identical per url to the single-process run of the same extraction
(parse -> markdown/text -> chunks) on the same rows.
"""

from __future__ import annotations

import os

import pytest

from docling_core_spark.operators.extract import (
    explode_chunks,
    extract_pages,
    extract_row,
    lineage_metrics,
    split_skew,
)
from docling_core_spark.sources.web_pages import synth_html, web_pages_df

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not available")


@pytest.fixture(scope="module")
def docs_df(spark):
    pages = web_pages_df(spark, SF_DIR)
    docs = extract_pages(split_skew(pages, jumbo_bytes=200_000), chunker="hybrid")
    docs.cache()
    yield docs
    docs.unpersist()


def test_extract_counts(spark, docs_df):
    n_pages = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert docs_df.count() == n_pages
    errs = docs_df.filter("error is not null").count()
    assert errs == 0, docs_df.filter("error is not null").select("url", "error").first()


def test_spark_matches_single_process_oracle(spark, docs_df):
    """Byte-identical markdown/text/chunks per url vs pure-python run."""
    sample = docs_df.select("url", "markdown", "plain_text", "chunks").limit(50).collect()
    from pyspark.sql import functions as F

    pages = web_pages_df(spark, SF_DIR).filter(F.col("url").isin([r["url"] for r in sample]))
    raw = {r["url"]: (bytes(r["html"]), r["lang"]) for r in pages.collect()}
    assert len(raw) == len(sample)
    for row in sample:
        html, lang = raw[row["url"]]
        oracle = extract_row(row["url"], html, lang, chunker="hybrid")
        assert row["markdown"] == oracle["markdown"], row["url"]
        assert row["plain_text"] == oracle["plain_text"], row["url"]
        spark_chunks = [(c["chunk_idx"], c["text"], tuple(c["headings"] or [])) for c in row["chunks"]]
        oracle_chunks = [
            (c["chunk_idx"], c["text"], tuple(c["headings"] or [])) for c in oracle["chunks"]
        ]
        assert spark_chunks == oracle_chunks, row["url"]


def test_chunk_explode(docs_df):
    chunks = explode_chunks(docs_df)
    assert chunks.count() > 0
    row = chunks.first()
    assert row["chunk_idx"] == 0


def test_lineage_metrics(docs_df):
    m = lineage_metrics(docs_df).collect()
    assert sum(r["n_pages"] for r in m) == docs_df.count()
    assert all(r["n_errors"] == 0 for r in m)


def test_determinism_across_parallelism(spark):
    """Same rows at different partition counts -> identical bytes (scaling
    correctness precondition for the N vs 4N efficiency claim)."""
    pages = web_pages_df(spark, SF_DIR).limit(40)
    a = extract_pages(pages.repartition(2)).select("url", "markdown").collect()
    b = extract_pages(pages.repartition(16)).select("url", "markdown").collect()
    assert {r["url"]: r["markdown"] for r in a} == {r["url"]: r["markdown"] for r in b}


def test_mega_page_generated():
    big = synth_html(101 * 2, "word " * 50, "en")  # doc_id 202: 202%101==0 mega
    small = synth_html(3, "word " * 50, "en")
    assert len(big) > 20 * len(small)


def test_error_rows_isolate_poisoned_rows(spark):
    """A failing row becomes an error row with real timing and lineage —
    never a failed task (exercised via the chaos-injection hook, since the
    fuzz-proven-total parser gives the isolation path no natural trigger)."""
    from docling_core_spark.operators.extract import lineage_metrics

    pages = web_pages_df(spark, SF_DIR).limit(40).cache()
    n = pages.count()
    out = extract_pages(pages, _fault_url_substr="/en/1").cache()
    errs = out.filter("error is not null")
    oks = out.filter("error is null")
    n_err = errs.count()
    assert 0 < n_err < n  # some poisoned, some healthy
    assert oks.count() == n - n_err
    row = errs.first()
    assert "injected fault" in row["error"]
    assert row["markdown"] is None and row["chunks"] == []
    assert row["html_bytes"] > 0 and row["parse_us"] >= 0
    # healthy rows are byte-identical to an uninjected run
    clean = extract_pages(pages).filter("error is null")
    a = {r["url"]: r["markdown"] for r in oks.select("url", "markdown").collect()}
    b = {r["url"]: r["markdown"] for r in clean.select("url", "markdown").collect()}
    assert all(b[u] == md for u, md in a.items())
    # lineage counts the failures
    m = lineage_metrics(out).collect()
    assert sum(r["n_errors"] for r in m) == n_err
    pages.unpersist()
    out.unpersist()
