"""Similarity search over the embeddings table.

Brute-force cosine top-k (correctness baseline, DuckDB-oracle-checked) and an
LSH-bucketed approximate variant (the 100 TB scale path: candidates come from
a sign-random-projection bucket join, never a full scan per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k nearest neighbours of one stored vector (brute force).

    The query vector is a 1-row broadcast; the scan is embarrassingly
    parallel; top-k is a tree-reduced TakeOrdered, not a global sort.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        _as_double(F.col("embedding")).alias("qv")
    )
    return (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_cosine(_as_double(F.col("embedding")), F.col("qv")), 5).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_sql(table: str = "embeddings", query_vec_id: int = 0, k: int = 10) -> str:
    """DuckDB oracle SQL for cosine_topk."""
    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM {table} WHERE vec_id = {query_vec_id}
)
SELECT e.vec_id, e.label,
       round(list_dot_product(e.embedding::DOUBLE[], q.qv)
             / greatest(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(q.qv, q.qv)), 1e-12), 5) AS cos_sim
FROM {table} e, q
WHERE e.vec_id <> {query_vec_id}
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {k}
"""


def _srp_bucket(vec, planes: list[list[float]]):
    """Sign-random-projection bucket id from fixed hyperplanes."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(p)) for p in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def _fixed_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k via sign-random-projection bucketing.

    At scale the bucket column is precomputed and partitioned-by; a query
    touches only its own bucket (1/2^n_planes of the data).  Recall is traded
    via n_planes; exactness is the cosine_topk baseline.
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    planes = _fixed_planes(dim, n_planes)
    with_bucket = embeddings.withColumn(
        "bucket", _srp_bucket(_as_double(F.col("embedding")), planes)
    )
    qrow = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        _as_double(F.col("embedding")).alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        with_bucket.crossJoin(F.broadcast(qrow))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_vec_id))
        .select(
            "vec_id",
            "label",
            F.round(_cosine(_as_double(F.col("embedding")), F.col("qv")), 5).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_cosine_dedup(embeddings: DataFrame, threshold: float = 0.95, n_planes: int = 4) -> DataFrame:
    """Embedding near-duplicate pairs: SRP-bucketed candidate join + cosine verify."""
    dim = len(embeddings.select("embedding").first()["embedding"])
    planes = _fixed_planes(dim, n_planes, seed=7)
    wb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v"),
        _srp_bucket(_as_double(F.col("embedding")), planes).alias("bucket"),
    )
    pairs = (
        wb.alias("a")
        .join(wb.alias("b"), "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(_cosine(F.col("a.v"), F.col("b.v")), 5).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
    return pairs
