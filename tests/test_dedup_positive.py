"""Positive-path dedup tests on duplicate-BEARING inputs.

The synthetic driver corpus has no natural exact duplicates, so the driver's
dedup_exact/embedding_cosine_dedup checks used to pass with 0 rows — group
assembly, the id cap, and pair emission were never value-checked (round-5
verdict "What's wrong #2").  These tests feed inputs that actually contain
duplicates and pin the positive behavior directly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_frame(spark):
    rows = [
        (1, "Hello, World!"),
        (2, "hello world"),          # same normalized content as 1
        (3, "HELLO... world???"),    # same normalized content as 1
        (4, "something else"),
        (5, "Something ELSE."),      # same normalized content as 4
        (6, "a singleton document"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(dup_frame):
    from docling_core_spark.operators.dedup import exact_duplicates

    out = {r.keep_doc_id: r for r in exact_duplicates(dup_frame).collect()}
    assert set(out) == {1, 4}
    assert out[1].n_docs == 3 and out[1].doc_ids == "1|2|3"
    assert out[4].n_docs == 2 and out[4].doc_ids == "4|5"


def test_exact_duplicates_group_id_cap(spark):
    from docling_core_spark.operators.dedup import exact_duplicates

    rows = [(i, "same text every time") for i in range(10, 20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    [row] = exact_duplicates(df, max_group_ids=3).collect()
    # n_docs counts the FULL group; doc_ids is capped at 3 sorted members
    assert row.n_docs == 10
    assert row.keep_doc_id == 10
    assert row.doc_ids == "10|11|12"


def test_with_synthetic_duplicates_yields_pairs_on_corpus(spark):
    from docling_core_spark.operators.dedup import (
        exact_duplicates,
        with_synthetic_duplicates,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    groups = exact_duplicates(with_synthetic_duplicates(docs)).collect()
    assert len(groups) > 0  # the de-vacuated driver input emits real groups
    for g in groups:
        # every group is (original, original + 1_000_000)
        ids = [int(x) for x in g.doc_ids.split("|")]
        assert g.n_docs == 2
        assert ids[1] == ids[0] + 1_000_000


def test_embedding_dedup_emits_clone_pairs(spark):
    from docling_core_spark.operators.similarity import (
        embedding_cosine_dedup,
        with_synthetic_duplicate_vectors,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = embedding_cosine_dedup(with_synthetic_duplicate_vectors(emb)).collect()
    assert len(pairs) > 0
    clone_pairs = [p for p in pairs if p.vec_b == p.vec_a + 1_000_000]
    assert clone_pairs, "expected (v, v+1M) clone pairs at cosine 1.0"
    assert all(p.cos_sim == pytest.approx(1.0) for p in clone_pairs)


def test_cap_hot_buckets_gate_matches_python_mirror(spark):
    """The skew-safe cap's surviving set is deterministic: the per-row md5-60
    gate must reproduce exactly in pure python (the oracle-mirror contract).
    Normal buckets (<= cap) must pass through untouched."""
    import hashlib

    from docling_core_spark.operators.dedup import cap_hot_buckets

    rows = [(d, 0, 7) for d in range(40)]           # hot bucket, 40 members
    rows += [(d, 1, 9) for d in range(100, 103)]    # normal bucket, 3 members
    banded = spark.createDataFrame(rows, "doc_id long, band int, bucket long")
    cap = 4
    got = {
        (r.doc_id, r.band, r.bucket)
        for r in cap_hot_buckets(banded, ("band", "bucket"), cap).collect()
    }

    def gate(d, band, bucket, cnt):
        h = int(hashlib.md5(f"{d}:{band}:{bucket}".encode()).hexdigest()[:15], 16)
        return h % cnt < cap

    want = {(d, 0, 7) for d in range(40) if gate(d, 0, 7, 40)}
    want |= {(d, 1, 9) for d in range(100, 103)}
    assert got == want
    assert {x for x in got if x[1] == 1} == {(d, 1, 9) for d in range(100, 103)}
    assert 0 < len([x for x in got if x[1] == 0]) < 40


def test_simhash_cap_cross_engine_with_hot_buckets(spark):
    """De-vacuated cap parity: a mass-duplicate corpus forces oversized
    buckets at max_bucket_size=2, and the Spark result must still equal the
    DuckDB oracle (same gate, same survivors, same pairs)."""
    import duckdb

    from docling_core_spark.operators.dedup import (
        simhash_duplicates,
        simhash_duplicates_sql,
    )

    rows = [(i, "identical boilerplate page text for every crawl url") for i in range(12)]
    rows += [(100, "a genuinely different document about spark internals")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_duplicates(docs, max_bucket_size=2).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t.replace(chr(39), chr(39) * 2)}')" for d, t in rows)
        + ") t(doc_id, text)"
    )
    want = {
        tuple(r)
        for r in con.execute(
            simhash_duplicates_sql(max_bucket_size=2)
        ).fetchall()
    }
    con.close()
    assert got == want
    assert got, "hot-bucket corpus must still emit capped duplicate pairs"


def test_simhash_xxhash64_toggle_same_semantics(spark):
    """The pure-scale xxhash64 token hash finds the same near-dup structure
    (different hash family, same banded-LSH decisions on clear cases)."""
    from docling_core_spark.operators.dedup import simhash_duplicates

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [(1, base), (2, base.upper() + "!!!"), (3, "completely unrelated text about databases and joins and shuffles")],
        ["doc_id", "text"],
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_duplicates(docs, hash_fn="xxhash64").collect()
    }
    # same normalized token set -> identical signature under ANY hash family
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_cap_hot_buckets_multi_band_membership(spark):
    """A doc sits in several band buckets; the gate decides each (doc,
    band, bucket) row independently (hash includes the bucket keys), so a
    doc thinned from one hot bucket survives in its other buckets."""
    import hashlib

    from docling_core_spark.operators.dedup import cap_hot_buckets

    rows = [(d, 0, 7) for d in range(30)]            # hot (30 > cap)
    rows += [(d, 1, d % 10) for d in range(30)]      # same docs, cool (3 <= cap)
    banded = spark.createDataFrame(rows, "doc_id long, band int, bucket long")
    out = cap_hot_buckets(banded, ("band", "bucket"), 4).collect()
    band1 = [(r.doc_id, r.bucket) for r in out if r.band == 1]
    assert len(band1) == 30  # cool buckets untouched
    band0 = [r.doc_id for r in out if r.band == 0]
    assert 0 < len(band0) < 30  # hot bucket thinned

    def gate(d):
        h = int(hashlib.md5(f"{d}:0:7".encode()).hexdigest()[:15], 16)
        return h % 30 < 4

    assert sorted(band0) == [d for d in range(30) if gate(d)]

def test_embedding_dedup_cap_gate_matches_python_mirror(spark):
    """Round-8: embedding_cosine_dedup's bucket cap is the same skew-safe
    cap_hot_buckets hash gate as minhash/simhash (keyed by vec_id) — a hot
    SRP bucket thins to the md5-60 survivor set, reproduced exactly in pure
    python (the oracle-mirror contract); the default 1024 cap never fires
    at test scale, so this drives it at cap=3 over a 20-member bucket."""
    import hashlib

    from docling_core_spark.operators.similarity import embedding_cosine_dedup
    from docling_core_spark.oracle_expected import _srp_bucket, _srp_weights

    dim, n, cap = 8, 20, 3
    vec = [0.5] * dim  # identical vectors: one bucket, cosine 1.0 pairs
    emb = spark.createDataFrame(
        [(i, 0, vec) for i in range(n)],
        "vec_id long, label int, embedding array<double>",
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_dedup(emb, max_bucket_size=cap).collect()
    }
    bucket = _srp_bucket([float(x) for x in vec], _srp_weights(4, dim, 7))
    survivors = sorted(
        i
        for i in range(n)
        if int(hashlib.md5(f"{i}:{bucket}".encode()).hexdigest()[:15], 16) % n < cap
    )
    assert 0 < len(survivors) < n
    want = {(a, b) for i, a in enumerate(survivors) for b in survivors[i + 1 :]}
    assert got == want
