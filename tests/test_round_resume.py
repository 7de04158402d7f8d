"""Round-level checkpoint/resume for the iterative operators (round-8).

bpe_train / duplicate_clusters / kmeans_refined_centroids each iterate a
driver loop; a killed job previously restarted from round zero.  These tests
inject a fault in the real crash window — AFTER a round's commit record —
and prove a fresh call with the same checkpoint_dir resumes from the
committed round and finishes with results identical to an uninterrupted run.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rounds(d):
    from docling_core_spark.sources.checkpoint import _rounds_path

    return sorted(p.name for p in _rounds_path(str(d)).glob("round_*.json"))


def test_bpe_train_resumes_from_committed_round(spark, tmp_path):
    from docling_core_spark.operators.bpe import bpe_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(150)
    want = [tuple(r) for r in bpe_train(docs, num_merges=12).collect()]

    ckpt = tmp_path / "bpe"
    with pytest.raises(RuntimeError, match="injected fault"):
        bpe_train(docs, num_merges=12, checkpoint_dir=str(ckpt), _fault_after_round=4)
    assert len(_rounds(ckpt)) == 4  # four committed rounds survived the crash

    got = [
        tuple(r)
        for r in bpe_train(docs, num_merges=12, checkpoint_dir=str(ckpt)).collect()
    ]
    assert got == want
    # the resumed run continued from round 5 — it did NOT restart at zero
    assert len(_rounds(ckpt)) == 12
    # a third call sees done=True and replays nothing (log unchanged)
    again = [
        tuple(r)
        for r in bpe_train(docs, num_merges=12, checkpoint_dir=str(ckpt)).collect()
    ]
    assert again == want
    assert len(_rounds(ckpt)) == 12


def test_duplicate_clusters_resumes_from_committed_labels(spark, tmp_path):
    from docling_core_spark.operators.dedup import duplicate_clusters

    # chain graph 0-1-2-...-10: diameter forces many propagation rounds, so
    # the fault lands mid-convergence with real remaining work
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(10)], "doc_a long, doc_b long, jaccard double"
    )
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    kw = dict(convergence_check_every=2, checkpoint_every=3)
    want = sorted(
        tuple(r) for r in duplicate_clusters(docs, pairs=pairs, **kw).collect()
    )
    assert want and all(r[1] == 0 for r in want)  # one component, min label 0

    ckpt = tmp_path / "cc"
    with pytest.raises(RuntimeError, match="injected fault"):
        duplicate_clusters(
            docs, pairs=pairs, checkpoint_dir=str(ckpt), _fault_after_round=4, **kw
        )
    crashed_rounds = _rounds(ckpt)
    assert crashed_rounds  # at least one committed round survived

    got = sorted(
        tuple(r)
        for r in duplicate_clusters(
            docs, pairs=pairs, checkpoint_dir=str(ckpt), **kw
        ).collect()
    )
    assert got == want
    assert len(_rounds(ckpt)) > len(crashed_rounds)  # continued, not restarted


def test_kmeans_resumes_from_committed_centroids(spark, tmp_path):
    from docling_core_spark.operators.similarity import kmeans_refined_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(300)
    want = sorted(
        (r["centroid_id"], tuple(r["cv"]))
        for r in kmeans_refined_centroids(emb, iterations=5).collect()
    )

    ckpt = tmp_path / "km"
    with pytest.raises(RuntimeError, match="injected fault"):
        kmeans_refined_centroids(
            emb, iterations=5, checkpoint_dir=str(ckpt), _fault_after_round=2
        )
    assert len(_rounds(ckpt)) == 2

    got = sorted(
        (r["centroid_id"], tuple(r["cv"]))
        for r in kmeans_refined_centroids(
            emb, iterations=5, checkpoint_dir=str(ckpt)
        ).collect()
    )
    assert got == want
    assert len(_rounds(ckpt)) == 5
