"""Weighted corpus mixing: rate math, determinism, and budget behavior."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def test_mix_rates_and_determinism(spark):
    from docling_core_spark.operators.textstats import mix_corpora

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = mix_corpora(docs, token_budget=10_000).collect()
    assert out, "non-vacuous"
    # deterministic: identical selection on a re-run
    again = mix_corpora(docs, token_budget=10_000).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    # per-language sampled token mass lands near its budget share
    # (hash sampling: expect ~rate * tokens_s = budget * w_s, +-40%)
    share = {}
    for r in out:
        share[r.lang] = share.get(r.lang, 0) + r.ws_tokens
    from docling_core_spark.operators.textstats import MIX_WEIGHTS

    for lang, got in share.items():
        target = 10_000 * MIX_WEIGHTS[lang]
        assert 0.5 * target < got < 1.6 * target, (lang, got, target)


def test_mix_huge_budget_keeps_everything(spark):
    from docling_core_spark.operators.textstats import mix_corpora

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = mix_corpora(docs, token_budget=10_000_000)
    # rate clamps at 1.0 for every source: the whole corpus is selected
    assert out.count() == docs.count()
    assert out.filter("rate < 1.0").count() == 0


def test_mix_unknown_source_weight_zero(spark):
    from docling_core_spark.operators.textstats import mix_corpora

    docs = spark.createDataFrame(
        [(1, "some words here", "xx"), (2, "other words", "en")],
        "doc_id long, text string, lang string",
    )
    out = mix_corpora(docs, weights={"en": 1.0}, token_budget=10_000).collect()
    assert {r.lang for r in out} == {"en"}
