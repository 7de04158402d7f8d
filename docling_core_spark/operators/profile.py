"""Profiler aggregates (reference profiler/doc_profiler.py:176-425).

A1 per-doc counts come free from the extract stage columns (n_texts,
n_tables, ...).  A2 collection stats (sums, means, deciles, histograms)
compile to Catalyst hash aggregates — partial map-side combine, one shuffle.

The oracle-checkable variants run over the raw `documents` table; the
extracted-doc variants (profile of parsed trees) are deterministic but not
SQL-expressible (they need the HTML parse), so they register rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docling_core_spark.operators.canon import canonical_order

_DECILES = [i / 10 for i in range(1, 10)]

# t-digest/GK accuracy for the approx scale path: error <= 1/accuracy of rank
_APPROX_ACCURACY = 10000


def _decile_expr(c, scale: str):
    """Decile aggregate for the requested scale.

    scale="exact" (F.percentile) materializes every value in one aggregation
    buffer — needed for DuckDB quantile_cont hash parity, but a single-
    aggregator OOM at 10^12 rows.  scale="approx" (F.approx_percentile) is a
    mergeable bounded-memory sketch with map-side partials: the 100 TB path.
    """
    qs = F.array(*[F.lit(q) for q in _DECILES])
    if scale == "approx":
        return F.approx_percentile(c, qs, F.lit(_APPROX_ACCURACY))
    return F.percentile(c, qs)


def collection_stats(docs: DataFrame, col: str = "n_chars", scale: str = "exact") -> DataFrame:
    """Count/sum/avg/min/max + decile columns of a numeric column (A2).

    Deciles come out as nine scalar columns (p10..p90), not an array — scalar
    output columns are the driver-boundary contract (the correctness
    canonicalizer cannot sort array cells).  ``scale="approx"`` swaps the
    exact percentile for a mergeable sketch (use at large scale).
    """
    c = F.col(col).cast("double")
    deciles = _decile_expr(c, scale)
    agg = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(c).cast("double").alias("total"),
        F.round(F.avg(c), 4).alias("mean"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        deciles.alias("_dec"),
    )
    return agg.select(
        "n_docs",
        "total",
        "mean",
        "min",
        "max",
        *[
            F.round(F.element_at("_dec", i + 1), 4).alias(f"p{(i + 1) * 10}")
            for i in range(len(_DECILES))
        ],
    )


def collection_stats_sql(
    table: str = "documents", col: str = "n_chars", scale: str = "exact"
) -> str:
    """DuckDB oracle SQL for collection_stats.

    scale="exact" mirrors F.percentile with quantile_cont (interpolated);
    scale="approx" mirrors F.approx_percentile with quantile_disc — at
    oracle size the GK sketch is in its exact regime and returns the same
    discrete data values (verified element-for-element at sf0.01; at real
    scale the sketch is approximate by design and the oracle no longer
    applies, which is the point of the scale knob)."""
    quantile_fn = "quantile_disc" if scale == "approx" else "quantile_cont"
    decile_cols = ",\n       ".join(
        f"round({quantile_fn}({col}::DOUBLE, {q}), 4) AS p{int(q * 100)}" for q in _DECILES
    )
    return f"""
SELECT COUNT(*) AS n_docs,
       CAST(SUM({col}::DOUBLE) AS DOUBLE) AS total,
       round(AVG({col}::DOUBLE), 4) AS mean,
       MIN({col}::DOUBLE) AS min,
       MAX({col}::DOUBLE) AS max,
       {decile_cols}
FROM {table}
"""


def histogram(docs: DataFrame, col: str = "n_chars", bins: int = 10, lo: float = 0.0, hi: float = 5000.0) -> DataFrame:
    """Fixed-range histogram via width_bucket-style bucketing (A2)."""
    c = F.col(col).cast("double")
    width = (hi - lo) / bins
    bucket = F.least(F.greatest(F.floor((c - lo) / width), F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .transform(lambda d: canonical_order(d, "bucket"))
    )


def histogram_sql(table: str = "documents", col: str = "n_chars", bins: int = 10, lo: float = 0.0, hi: float = 5000.0) -> str:
    """DuckDB oracle SQL for histogram."""
    width = (hi - lo) / bins
    return f"""
SELECT CAST(least(greatest(floor(({col}::DOUBLE - {lo}) / {width}), 0), {bins - 1}) AS INT) AS bucket,
       COUNT(*) AS n
FROM {table}
GROUP BY bucket
ORDER BY bucket
"""


def group_profile(docs: DataFrame, key: str = "lang") -> DataFrame:
    """Per-group document profile (count, avg/total size) — A2 grouped form."""
    return (
        docs.groupBy(key)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        )
        .transform(lambda d: canonical_order(d, key))
    )


def group_profile_sql(table: str = "documents", key: str = "lang") -> str:
    """DuckDB oracle SQL for group_profile."""
    return f"""
SELECT {key}, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       round(AVG(n_chars::DOUBLE), 4) AS avg_chars
FROM {table}
GROUP BY {key}
ORDER BY {key}
"""


def extracted_doc_profile(extracted: DataFrame) -> DataFrame:
    """A1 per-doc profile over the extraction output (rows-only check)."""
    return extracted.select(
        "url",
        "n_texts",
        "n_tables",
        "n_pictures",
        "n_groups",
        F.size("chunks").alias("n_chunks"),
    ).transform(lambda d: canonical_order(d, "url"))


def extracted_collection_profile(extracted: DataFrame, scale: str = "exact") -> DataFrame:
    """A2 collection profile over the extraction output.

    Deciles of n_texts come out as scalar columns (driver-boundary contract —
    no array-typed output columns).  ``scale="approx"`` uses the mergeable
    percentile sketch (the 100 TB path; exact is for oracle hash parity).
    """
    agg = extracted.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_texts").alias("total_texts"),
        F.sum("n_tables").alias("total_tables"),
        F.sum("n_pictures").alias("total_pictures"),
        F.sum(F.size("chunks")).alias("total_chunks"),
        F.round(F.avg("n_texts"), 4).alias("avg_texts"),
        _decile_expr(F.col("n_texts").cast("double"), scale).alias("_dec"),
    )
    return agg.select(
        "n_docs",
        "total_texts",
        "total_tables",
        "total_pictures",
        "total_chunks",
        "avg_texts",
        *[
            F.round(F.element_at("_dec", i + 1), 4).alias(f"texts_p{(i + 1) * 10}")
            for i in range(len(_DECILES))
        ],
    )
