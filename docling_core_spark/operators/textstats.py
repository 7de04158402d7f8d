"""Text-analysis operators over the documents table.

All hot-path expressions are Catalyst-native (no Python UDFs): language ID,
quality scoring, token counting, and fingerprinting compile to whole-stage
codegen and are verified against a DuckDB oracle running equivalent ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docling_core_spark.operators.canon import canonical_order

# small fixed stopword sets per language (public lists, truncated for
# deterministic SQL-parity between Spark and the DuckDB oracle)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "fr": ["le", "la", "les", "et", "des", "une"],
    "de": ["der", "die", "und", "das", "ein", "nicht"],
    "es": ["el", "los", "las", "una", "por", "para"],
}

_PUNCT_CLASS = r"[.,;:!?]"


def _padded(col):
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def lang_score_expr(col, lang: str):
    """Count of distinct stopwords of `lang` present (0..6)."""
    padded = _padded(col)
    score = F.lit(0)
    for w in LANG_STOPWORDS[lang]:
        score = score + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    return score


def lang_score_sql(col: str, lang: str) -> str:
    """DuckDB-equivalent of lang_score_expr."""
    padded = f"(' ' || lower({col}) || ' ')"
    parts = [
        f"(CASE WHEN {padded} LIKE '% {w} %' THEN 1 ELSE 0 END)" for w in LANG_STOPWORDS[lang]
    ]
    return "(" + " + ".join(parts) + ")"


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-voting language guess per document (n-gram-free heuristic)."""
    scored = docs.select(
        "doc_id",
        *[lang_score_expr(F.col("text"), lang).alias(f"score_{lang}") for lang in LANG_STOPWORDS],
    )
    langs = list(LANG_STOPWORDS)
    # argmax with deterministic tie-break on language order
    guess = F.lit("und")
    best = F.lit(0)
    for lang in langs:
        cond = F.col(f"score_{lang}") > best
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return scored.select(
        "doc_id",
        *[F.col(f"score_{lang}") for lang in langs],
        guess.alias("lang_guess"),
    ).transform(lambda d: canonical_order(d, "doc_id"))


def language_id_sql(table: str = "documents") -> str:
    """DuckDB oracle SQL for language_id."""
    langs = list(LANG_STOPWORDS)
    score_cols = ",\n  ".join(f"{lang_score_sql('text', lang)} AS score_{lang}" for lang in langs)
    # same sequential argmax with tie-break on order
    guess = "'und'"
    best = "0"
    for lang in langs:
        guess = f"(CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {guess} END)"
        best = f"(CASE WHEN score_{lang} > {best} THEN score_{lang} ELSE {best} END)"
    return f"""
WITH scored AS (
  SELECT doc_id,
  {score_cols}
  FROM {table}
)
SELECT doc_id, {', '.join('score_' + lang for lang in langs)},
       {guess} AS lang_guess
FROM scored
ORDER BY doc_id
"""


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality features: length, punctuation/stopword/digit ratios."""
    text = F.col("text")
    n_chars = F.length(text)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.when(F.length(F.trim(text)) == 0, 0).otherwise(F.size(words))
    n_punct = F.length(text) - F.length(F.regexp_replace(text, _PUNCT_CLASS, ""))
    n_digits = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    en_stop = lang_score_expr(text, "en")
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_digits / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        en_stop.cast("int").alias("en_stopword_hits"),
        F.round(n_chars / F.greatest(n_words, F.lit(1)), 4).alias("avg_word_len"),
    ).transform(lambda d: canonical_order(d, "doc_id"))


def quality_scores_sql(table: str = "documents") -> str:
    """DuckDB oracle SQL for quality_scores."""
    return f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_words,
  round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
        / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
        / greatest(length(text), 1)::DOUBLE, 6) AS digit_ratio,
  CAST({lang_score_sql('text', 'en')} AS INT) AS en_stopword_hits,
  round(length(text) / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
        ELSE length(regexp_split_to_array(trim(text), '\\s+')) END, 1)::DOUBLE, 4) AS avg_word_len
FROM {table}
ORDER BY doc_id
"""


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens and a BPE-ish subword proxy count (word-chars/4 heuristic)."""
    text = F.col("text")
    ws_tokens = F.when(F.length(F.trim(text)) == 0, 0).otherwise(F.size(F.split(F.trim(text), r"\s+")))
    word_chars = F.length(F.regexp_replace(text, r"\s", ""))
    return docs.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        F.ceil(word_chars / 4.0).cast("long").alias("bpe_tokens_est"),
    ).transform(lambda d: canonical_order(d, "doc_id"))


def token_counts_sql(table: str = "documents") -> str:
    """DuckDB oracle SQL for token_counts."""
    return f"""
SELECT doc_id,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens,
  CAST(ceil(length(regexp_replace(text, '\\s', '', 'g')) / 4.0) AS BIGINT) AS bpe_tokens_est
FROM {table}
ORDER BY doc_id
"""


def fingerprints(docs: DataFrame) -> DataFrame:
    """Normalized-content md5 fingerprint per document."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint")).transform(lambda d: canonical_order(d, "doc_id"))


def fingerprints_sql(table: str = "documents") -> str:
    """DuckDB oracle SQL for fingerprints."""
    return f"""
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
FROM {table}
ORDER BY doc_id
"""
