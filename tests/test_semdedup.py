"""SemDeDup (similarity.semdedup, Abbas 2023).

Value parity vs the single-process twin runs in tests/test_oracle_parity.py;
here: the clone-removal semantics and the scale-shape pins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_core_spark.operators.similarity import (
    semdedup,
    with_synthetic_duplicate_vectors,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_clones_removed_originals_kept(emb):
    dup = with_synthetic_duplicate_vectors(emb)
    rows = {r["vec_id"]: r for r in semdedup(dup).collect()}
    clones = [v for v in rows if v >= 1_000_000]
    assert clones, "duplicate-bearing input must contain clones"
    for cid in clones:
        orig = rows[cid - 1_000_000]
        clone = rows[cid]
        # identical vectors: same cluster, same centroid similarity; the
        # keep rule's vec_id tie-break keeps the original, removes the clone
        assert clone["cluster_id"] == orig["cluster_id"]
        assert clone["cent_sim"] == orig["cent_sim"]
        assert clone["keep"] == 0
        assert orig["keep"] == 1


def test_row_conservation(emb):
    dup = with_synthetic_duplicate_vectors(emb)
    n_in = dup.count()
    out = semdedup(dup)
    assert out.count() == n_in
    # every vector gets a cluster and a decision
    assert out.filter(F.col("cluster_id").isNull()).count() == 0


def test_no_dups_all_kept(emb):
    # the raw synthetic vectors have no pairs above the default eps
    out = semdedup(emb)
    assert out.filter(F.col("keep") == 0).count() == 0


def test_plan_shape(emb):
    plan = (
        semdedup(with_synthetic_duplicate_vectors(emb))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    # the assignment subtree is cut once (diamond reuse): the checkpointed
    # RDD shows up as an ExistingRDD scan
    assert "ExistingRDD" in plan
