"""Scale-path variants: approx percentiles (profile) and deep-diameter
connected components (dedup) — the two round-2 verdict scale items."""

from __future__ import annotations

import warnings

import pytest

from pyspark.sql import functions as F

from docling_core_spark.operators.dedup import duplicate_clusters
from docling_core_spark.operators.profile import collection_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i:03d}", float(i)) for i in range(1, 101)]
    return spark.createDataFrame(rows, "doc_id string, n_chars double")


def test_collection_stats_approx_matches_exact_at_small_scale(docs):
    exact = collection_stats(docs, "n_chars", scale="exact").collect()[0].asDict()
    approx = collection_stats(docs, "n_chars", scale="approx").collect()[0].asDict()
    assert approx["n_docs"] == exact["n_docs"]
    assert approx["total"] == exact["total"]
    for q in range(10, 100, 10):
        # accuracy 10000 on 100 rows: rank error 0 => off by at most one value
        assert abs(approx[f"p{q}"] - exact[f"p{q}"]) <= 1.0


def test_collection_stats_approx_plan_uses_sketch(docs):
    plan = collection_stats(docs, "n_chars", scale="approx")._jdf.queryExecution().toString()
    assert "approx_percentile" in plan or "ApproximatePercentile" in plan
    # the exact variant is the one that materializes every value
    exact_plan = collection_stats(docs, "n_chars", scale="exact")._jdf.queryExecution().toString()
    assert "approx_percentile" not in exact_plan


def test_duplicate_clusters_chain_graph(spark):
    """A path graph (diameter >> the near-clique assumption) converges with
    checkpointed lineage and k-round convergence checks."""
    n = 12
    pairs = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # no non-convergence warning
        out = duplicate_clusters(None, pairs=pairs).collect()
    assert len(out) == n
    assert {r.cluster_id for r in out} == {"n00"}
    assert all(r.cluster_size == n for r in out)


def test_duplicate_clusters_two_components(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    out = {r.doc_id: (r.cluster_id, r.cluster_size) for r in duplicate_clusters(None, pairs=pairs).collect()}
    assert out == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "x": ("x", 2), "y": ("x", 2),
    }


def test_kmeans_refined_centroids_deterministic_and_partial(spark, monkeypatch):
    """Lloyd refinement (round 6): identical centroids on re-run (exact
    quantized-integer sums), map-side partial aggregation in the recompute,
    and no window anywhere."""
    from docling_core_spark.operators.similarity import kmeans_refined_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r.centroid_id: r.cv for r in kmeans_refined_centroids(emb).collect()}
    b = {
        r.centroid_id: r.cv
        for r in kmeans_refined_centroids(emb.repartition(7)).collect()
    }
    assert a == b  # bit-identical under different partitioning
    plan = (
        kmeans_refined_centroids(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_sum" in plan
    assert "Window" not in plan


def test_ivf_kmeans_refines_toward_members(spark):
    """After refinement a centroid is the mean of its members, so the
    within-cluster cosine to the centroid must not degrade vs the raw
    sampled-centroid quantizer on average."""
    from pyspark.sql import functions as F

    from docling_core_spark.operators.similarity import ivf_kmeans_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    refined = ivf_kmeans_topk(emb).collect()
    raw = ivf_topk(emb).collect()
    assert len(refined) == len(raw) == 10
    # both return valid ranked candidates; the refined index's top result is
    # at least as close as the raw index's (better lists, never worse top-1)
    assert refined[0].cos_sim >= raw[0].cos_sim - 1e-9
