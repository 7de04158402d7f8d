"""Corpus-wide duplicate-span removal (C4 global step): semantics + plan."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "subscribe now.\nfollow us on social media.\nall rights reserved."
    rows = [
        (1, "unique alpha line one.\nunique alpha line two.\nunique alpha line three.\n" + boiler),
        (2, "unique beta line one.\nunique beta line two.\nunique beta line three.\n" + boiler),
        (3, boiler),                     # consists only of the boilerplate span
        (4, "short doc single line."),   # one partial window
        (5, ""),                         # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_dedup_removes_repeats_keeps_first(corpus):
    from docling_core_spark.operators.textstats import c4_span_dedup

    out = {r.doc_id: r for r in c4_span_dedup(corpus).collect()}
    boiler = "subscribe now.\nfollow us on social media.\nall rights reserved."
    # doc 1 is lexicographically first: keeps its unique span AND the boiler
    assert out[1].kept_text.endswith(boiler) and out[1].n_removed_spans == 0
    # docs 2 and 3 lose the boiler span to doc 1
    assert boiler not in out[2].kept_text and out[2].n_removed_spans == 1
    assert out[2].kept_text.startswith("unique beta line one.")
    assert out[3].kept_text == "" and out[3].n_removed_spans == 1
    # partial windows still count as spans; empty docs have none
    assert out[4].n_spans == 1 and out[4].n_removed_spans == 0
    assert out[5].n_spans == 0 and out[5].kept_text == ""


def test_span_dedup_within_doc_repeat(spark):
    from docling_core_spark.operators.textstats import c4_span_dedup

    span = "a.\nb.\nc."
    df = spark.createDataFrame([(7, span + "\n" + span)], "doc_id long, text string")
    [row] = c4_span_dedup(df).collect()
    # the second occurrence inside the SAME document is removed too
    assert row.kept_text == span and row.n_spans == 2 and row.n_removed_spans == 1


def test_span_dedup_plan_no_window(spark, monkeypatch):
    from docling_core_spark.operators.textstats import c4_span_dedup

    monkeypatch.setenv("SPARK_GRAFT_CANONICAL", "0")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = c4_span_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    # keeper selection is the min-struct agg with map-side partials, never a
    # row_number window over the fingerprint (the hot-key trap)
    assert "Window" not in plan
    assert "partial_min" in plan
