"""Interleaved A/B for the round-2 dedup bench deltas (VERDICT item 6).

Round-2 added semantics to three dedup queries and their bench times rose:
exact 1.81->3.22 s (sorted doc_ids groups), minhash 4.84->6.37 s (bucket-cap
window), simhash 2.81->3.83 s (banded Hamming<=3 instead of equality).  On a
host with 2-3x noise only an interleaved same-process A/B is valid
(CLAUDE.md): this script alternates the r2 code with r1-equivalent variants
and a candidate optimization, and prints medians per variant.

Usage: python scripts/ab_dedup.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import Window, functions as F

sys.path.insert(0, ".")

from docling_core_spark.operators.dedup import (  # noqa: E402
    SIMHASH_BANDS,
    SIMHASH_BITS,
    exact_duplicates,
    minhash_lsh_duplicates,
    minhash_signatures,
    simhash_duplicates,
    simhash_signatures,
)
from docling_core_spark.session import get_spark  # noqa: E402


def exact_r1(docs):
    """r1 form: no sorted doc_ids string column."""
    fp = docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")).alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


def minhash_nocap(docs):
    """r1 form: banded join without the bucket-cap window."""
    return minhash_lsh_duplicates(docs, max_bucket_size=1 << 30)


def simhash_h0(docs):
    """r1 form: exact-signature equality join (Hamming 0)."""
    sig = simhash_signatures(docs)
    return (
        sig.alias("a")
        .join(sig.alias("b"), "simhash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab-dedup")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32).cache()
    docs.count()  # materialize + warm

    variants = {
        "exact_r2": lambda: exact_duplicates(docs),
        "exact_r1": lambda: exact_r1(docs),
        "minhash_r2_cap": lambda: minhash_lsh_duplicates(docs),
        "minhash_r1_nocap": lambda: minhash_nocap(docs),
        "simhash_r2_h3": lambda: simhash_duplicates(docs),
        "simhash_r1_h0": lambda: simhash_h0(docs),
    }

    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(rounds):
        for name, fn in variants.items():  # interleaved within each round
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)

    out = {k: round(statistics.median(v), 3) for k, v in times.items()}
    out["_all"] = {k: [round(x, 3) for x in v] for k, v in times.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
