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


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", Table A1): duplicate-line fraction,
    duplicate-line character fraction, max line occurrences, and the
    fraction of word-bigram positions taken by the most frequent bigram.

    Scale shape: two hash aggregations keyed (doc_id, line) and
    (doc_id, bigram) — partial map-side combine, no window, no collect;
    the per-doc rollup and joins shuffle on doc_id only.  Bigrams come
    from zip_with over shifted slices (never element_at, which is
    interpreted per element)."""
    text = F.col("text")
    lines = F.filter(F.split(text, "\n"), lambda x: F.length(F.trim(x)) > 0)
    line_rows = docs.select("doc_id", F.explode(lines).alias("line"))
    per_line = line_rows.groupBy("doc_id", "line").agg(F.count("*").alias("cnt"))
    line_agg = per_line.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.round(
            (F.sum("cnt") - F.count("*")) / F.greatest(F.sum("cnt"), F.lit(1)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(0))
            / F.greatest(F.sum(F.col("cnt") * F.length("line")), F.lit(1)),
            6,
        ).alias("dup_line_char_frac"),
        F.max("cnt").cast("long").alias("max_line_occurrences"),
    )

    words = F.split(F.lower(F.trim(text)), r"\s+")
    with_words = docs.filter(F.length(F.trim(text)) > 0).select(
        "doc_id", words.alias("ws")
    )
    bigrams = F.zip_with(
        F.expr("slice(ws, 1, size(ws) - 1)"),
        F.expr("slice(ws, 2, size(ws) - 1)"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bigram_rows = with_words.select("doc_id", F.explode(bigrams).alias("bigram"))
    per_bigram = bigram_rows.groupBy("doc_id", "bigram").agg(F.count("*").alias("cnt"))
    bigram_agg = per_bigram.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.round(F.max("cnt") / F.greatest(F.sum("cnt"), F.lit(1)), 6).alias(
            "top_bigram_frac"
        ),
    )

    return (
        docs.select("doc_id")
        .join(line_agg, "doc_id", "left")
        .join(bigram_agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
            F.coalesce("max_line_occurrences", F.lit(0)).alias("max_line_occurrences"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
        .transform(lambda d: canonical_order(d, "doc_id"))
    )


def repetition_scores_sql(table: str = "documents") -> str:
    """DuckDB oracle SQL for repetition_scores."""
    return f"""
WITH lines AS (
  SELECT doc_id, l AS line
  FROM {table}, unnest(string_split(text, chr(10))) AS t(l)
  WHERE length(trim(l)) > 0
),
per_line AS (
  SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY doc_id, line
),
line_agg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_lines,
         round((sum(cnt) - count(*)) / greatest(sum(cnt), 1)::DOUBLE, 6) AS dup_line_frac,
         round(sum(CASE WHEN cnt > 1 THEN cnt * length(line) ELSE 0 END)
               / greatest(sum(cnt * length(line)), 1)::DOUBLE, 6) AS dup_line_char_frac,
         CAST(max(cnt) AS BIGINT) AS max_line_occurrences
  FROM per_line GROUP BY doc_id
),
words AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
  FROM {table} WHERE length(trim(text)) > 0
),
bigrams AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
  FROM words, unnest(generate_series(1, len(ws) - 1)) AS g(i)
),
per_bigram AS (
  SELECT doc_id, bigram, count(*) AS cnt FROM bigrams GROUP BY doc_id, bigram
),
bigram_agg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         round(max(cnt) / greatest(sum(cnt), 1)::DOUBLE, 6) AS top_bigram_frac
  FROM per_bigram GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(n_lines, 0) AS n_lines,
       coalesce(dup_line_frac, 0.0) AS dup_line_frac,
       coalesce(dup_line_char_frac, 0.0) AS dup_line_char_frac,
       coalesce(max_line_occurrences, 0) AS max_line_occurrences,
       coalesce(n_bigrams, 0) AS n_bigrams,
       coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
FROM {table} d
LEFT JOIN line_agg USING (doc_id)
LEFT JOIN bigram_agg USING (doc_id)
ORDER BY doc_id
"""


_HASH60_MAX = 1 << 60


def sample_by_hash(docs: DataFrame, rate: float = 0.1, seed: str = "s42") -> DataFrame:
    """Deterministic content-independent downsampling: keep a document iff
    its 60-bit md5(doc_id || seed) falls under rate * 2^60.

    The training-data staple for reproducible corpus subsets: map-only (the
    filter is pushed to the scan), no RNG state, identical selection on any
    cluster size or partitioning, and re-runs/new seeds compose.  The
    60-bit md5 prefix is exactly reproducible in DuckDB
    (('0x' || substr(md5(x),1,15))::BIGINT)."""
    threshold = int(rate * _HASH60_MAX)
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(seed))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select("doc_id", bucket.alias("hash60"))
        .filter(F.col("hash60") < F.lit(threshold))
        .transform(lambda d: canonical_order(d, "doc_id"))
    )


def sample_by_hash_sql(table: str = "documents", rate: float = 0.1, seed: str = "s42") -> str:
    """DuckDB oracle SQL for sample_by_hash."""
    threshold = int(rate * _HASH60_MAX)
    return f"""
SELECT doc_id,
       ('0x' || substr(md5(doc_id || '{seed}'), 1, 15))::BIGINT AS hash60
FROM {table}
WHERE ('0x' || substr(md5(doc_id || '{seed}'), 1, 15))::BIGINT < {threshold}
ORDER BY doc_id
"""
