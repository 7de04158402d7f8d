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


def test_zero_token_source_never_selected(spark):
    """A source whose total token count is 0 must sample at rate 0.0 — not
    slip through least(1.0, NULL) = 1.0 (NULL-skipping least in both
    engines).  Empty-text docs of an unweighted source stay out."""
    import duckdb

    from docling_core_spark.operators.textstats import mix_corpora, mix_corpora_sql

    rows = [(1, "en", "real content with several words here"),
            (2, "xx", ""), (3, "xx", "   "), (4, "en", "more english words")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = mix_corpora(docs, weights={"en": 1.0}).collect()
    assert all(r.lang != "xx" for r in got)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{l}', '{t}')" for d, l, t in rows)
        + ") t(doc_id, lang, text)"
    )
    want = con.execute(mix_corpora_sql(weights={"en": 1.0})).fetchall()
    con.close()
    assert {r.doc_id for r in got} == {w[0] for w in want}
