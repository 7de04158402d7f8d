"""Driver-boundary contract guards.

The correctness driver canonicalizes query output with a pandas sort over all
columns — array/map cells crash it (round-1 lesson: 6 ERR rows).  These tests
pin the contract: every queries() output schema is scalar-only, plan
construction never launches a Spark job, and the near-dup operators have real
near-dup semantics (not equality-only).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType

import __spark_entry__ as entrymod

SF_SMALL = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMALL), reason="testdata not available"
)


def test_no_array_columns_in_any_query_output(spark):
    """Driver canonicalizer contract: no array/map-typed output columns."""
    bad = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMALL)
        arrays = [
            f.name for f in df.schema.fields if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if arrays:
            bad[name] = arrays
    assert not bad, f"array-typed output columns would crash the driver: {bad}"


def test_entry_schema_scalar_only(spark):
    df = entrymod.entry(spark)
    assert not any(isinstance(f.dataType, (ArrayType, MapType)) for f in df.schema.fields)


def test_plan_construction_launches_no_job(spark):
    """ann_lsh_topk/embedding_cosine_dedup must not run driver-side jobs
    while building the plan (round-1: a .first() to learn the embedding dim).

    A mapInPandas source that raises on execution proves it: if plan
    construction evaluated anything, these calls would throw.
    """
    from docling_core_spark.operators import similarity

    def boom(_batches):
        raise RuntimeError("plan construction must not execute the source")
        yield  # pragma: no cover

    src = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.5)).alias("embedding"),
        F.lit(0).alias("label"),
    )
    poisoned = src.mapInPandas(boom, schema=src.schema)
    similarity.ann_lsh_topk(poisoned)  # no .collect(): plan only
    similarity.embedding_cosine_dedup(poisoned)
    similarity.srp_buckets(poisoned)


def test_simhash_pairs_docs_differing_by_one_token(spark):
    """Hamming<=3 banding must pair near-identical docs, not just identical."""
    from docling_core_spark.operators.dedup import simhash_duplicates

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "jackdaws love my big sphinx of quartz and zebras vex badly "
        "judging waltz nymphs for quick bright vows"
    )
    variant = base.replace("seventeen", "eighteen")
    unrelated = (
        "completely different subject matter entirely about spark catalyst "
        "optimizer plans shuffles partitions executors broadcast joins and "
        "adaptive query execution at terabyte scale"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, variant), (3, unrelated)], ["doc_id", "text"]
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_duplicates(docs).collect()}
    assert (1, 2) in pairs, f"near-identical docs not paired: {pairs}"
    assert pairs[(1, 2)] > 0, "expected a nonzero Hamming distance (true near-dup)"
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_lsh_bucket_cap_survives_degenerate_input(spark):
    """All-identical corpus: the capped bucket join must stay bounded and run."""
    from docling_core_spark.operators.dedup import minhash_lsh_duplicates

    docs = spark.createDataFrame(
        [(i, "same boilerplate page content repeated forever across the corpus")
         for i in range(300)],
        ["doc_id", "text"],
    )
    n = minhash_lsh_duplicates(docs, max_bucket_size=16).count()
    # hash-gate cap keeps an EXPECTED 16 members per hot bucket (binomial
    # spread around it) -> far below the uncapped C(300,2)=44850 quadratic;
    # 64 survivors per band bucket is a >6-sigma bound on the gate
    assert 0 < n <= 8 * (64 * 63 // 2)


def test_duplicate_clusters_connected_components(spark):
    """Chain-shaped pair graph must collapse into one component (needs >1
    label-propagation round), disjoint pairs stay separate clusters."""
    from docling_core_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        ["doc_a", "doc_b"],
    )
    docs = spark.createDataFrame([(i, "x") for i in range(30)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in duplicate_clusters(docs, pairs=pairs).collect()}
    assert {rows[i]["cluster_id"] for i in (1, 2, 3, 4)} == {1}
    assert rows[1]["cluster_size"] == 4
    assert rows[10]["cluster_id"] == 10 and rows[11]["cluster_id"] == 10
    assert rows[20]["cluster_id"] == rows[22]["cluster_id"] == 20
    assert rows[20]["cluster_size"] == 3
    assert set(rows) == {1, 2, 3, 4, 10, 11, 20, 21, 22}  # singletons excluded
