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


def test_resume_continues_not_restarts(spark, tmp_path):
    """Round-8 review: the old assertions could not distinguish a real
    resume from a silent restart-at-zero (deterministic results + rename
    overwrite made both look identical).  Pin continuation directly: the
    pre-crash round records must be byte-identical after the resumed call."""
    from docling_core_spark.operators.bpe import bpe_train
    from docling_core_spark.sources.checkpoint import _rounds_path

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(150)
    ckpt = tmp_path / "bpe2"
    with pytest.raises(RuntimeError, match="injected fault"):
        bpe_train(docs, num_merges=10, checkpoint_dir=str(ckpt), _fault_after_round=4)
    pre = {
        p.name: (p.read_bytes(), p.stat().st_mtime_ns)
        for p in _rounds_path(str(ckpt)).glob("round_*.json")
    }
    assert len(pre) == 4
    bpe_train(docs, num_merges=10, checkpoint_dir=str(ckpt)).collect()
    post = {
        p.name: (p.read_bytes(), p.stat().st_mtime_ns)
        for p in _rounds_path(str(ckpt)).glob("round_*.json")
    }
    assert len(post) == 10
    for name, v in pre.items():
        assert post[name] == v  # untouched: continued, never rewritten


def test_bpe_num_merges_prefix_semantics(spark, tmp_path):
    """BPE merges are prefix-stable, so a checkpoint dir trained to 12
    merges serves ANY request: a shorter num_merges slices the prefix, a
    longer one keeps training — never a silently-wrong count."""
    from docling_core_spark.operators.bpe import bpe_train
    from docling_core_spark.sources.checkpoint import _rounds_path

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(150)
    ckpt = tmp_path / "bpe3"
    with pytest.raises(RuntimeError, match="injected fault"):
        bpe_train(docs, num_merges=12, checkpoint_dir=str(ckpt), _fault_after_round=8)
    # shorter request against the 8-merge log: exactly 6 rows, = fresh run
    got6 = [
        tuple(r)
        for r in bpe_train(docs, num_merges=6, checkpoint_dir=str(ckpt)).collect()
    ]
    want6 = [tuple(r) for r in bpe_train(docs, num_merges=6).collect()]
    assert got6 == want6 and len(got6) == 6
    assert len(sorted(_rounds_path(str(ckpt)).glob("round_*.json"))) == 8
    # longer request keeps training past the log
    got12 = [
        tuple(r)
        for r in bpe_train(docs, num_merges=12, checkpoint_dir=str(ckpt)).collect()
    ]
    want12 = [tuple(r) for r in bpe_train(docs, num_merges=12).collect()]
    assert got12 == want12 and len(got12) == 12


def test_params_mismatch_refuses_resume(spark, tmp_path):
    """A checkpoint dir written with different operator knobs (or by a
    different operator) must raise, not silently continue from
    incompatible state."""
    from docling_core_spark.operators.bpe import bpe_train
    from docling_core_spark.operators.similarity import kmeans_refined_centroids

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    ckpt = str(tmp_path / "mix")
    bpe_train(docs, num_merges=3, checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="params"):
        bpe_train(docs, num_merges=6, merges_per_round=4, checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="params"):
        kmeans_refined_centroids(emb, iterations=3, checkpoint_dir=ckpt)


def test_corrupt_trailing_record_falls_back(spark, tmp_path):
    """Power loss can leave a durable rename pointing at truncated data:
    a zero-length trailing record must NOT brick resume — the previous
    committed round is the safe resume point.  Mid-log corruption raises."""
    from docling_core_spark.operators.bpe import bpe_train
    from docling_core_spark.sources.checkpoint import (
        _rounds_path,
        committed_rounds,
        last_committed_round,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(150)
    ckpt = str(tmp_path / "bpe4")
    with pytest.raises(RuntimeError, match="injected fault"):
        bpe_train(docs, num_merges=8, checkpoint_dir=ckpt, _fault_after_round=5)
    files = sorted(_rounds_path(ckpt).glob("round_*.json"))
    files[-1].write_bytes(b"")  # simulate torn write on the last record
    rec = last_committed_round(ckpt)
    assert rec["round"] == 4  # fell back one round
    got = [tuple(r) for r in bpe_train(docs, num_merges=8, checkpoint_dir=ckpt).collect()]
    want = [tuple(r) for r in bpe_train(docs, num_merges=8).collect()]
    assert got == want
    # mid-log corruption is real damage: refuse loudly
    files = sorted(_rounds_path(ckpt).glob("round_*.json"))
    files[2].write_bytes(b"{broken")
    with pytest.raises(ValueError, match="corrupt"):
        committed_rounds(ckpt)


def test_kmeans_state_pruned_to_last_round(spark, tmp_path):
    """Superseded per-round state directories are dead storage and get
    pruned as the loop advances (review finding: a 25-iteration run
    retained every labels/centroid copy forever)."""
    from pathlib import Path

    from docling_core_spark.operators.similarity import kmeans_refined_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    ckpt = tmp_path / "km2"
    kmeans_refined_centroids(emb, iterations=4, checkpoint_dir=str(ckpt))
    state_dirs = sorted(p.name for p in (Path(ckpt) / "state").iterdir())
    assert state_dirs == ["round_000004_centroids"]
