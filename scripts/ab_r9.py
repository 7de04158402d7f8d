"""Interleaved A/B for the round-9 operator optimizations.

OLD implementations are inlined below (copied from the pre-r9 tree) so both
versions run alternately in ONE process — the only timing protocol that is
valid on this noisy shared host (CLAUDE.md round-2/5 findings).

    python scripts/ab_r9.py [sf_dir] [rounds] [op ...]

Ops: classifier dsir semdedup bloom minhash fineweb
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


# ---------------------------------------------------------------------------
# OLD: classifier (interpreted element_at fold + explode gradient)
# ---------------------------------------------------------------------------


def _old_with_weights(feats, w):
    spark = feats.sparkSession
    wrow = spark.createDataFrame([(w,)], "warr array<double>")
    return feats.crossJoin(F.broadcast(wrow))


def _old_z_col(bias):
    return F.aggregate(
        F.col("dims"),
        F.lit(float(bias)),
        lambda acc, d: acc + F.element_at(F.col("warr"), d + 1),
    )


def _old_sigmoid(z):
    return F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))


def old_classifier_score(docs, iterations=4, threshold=0.5):
    from docling_core_spark.operators.classifier import CLS_DIMS, CLS_LR, _Q, _features
    from docling_core_spark.operators.canon import canonical_order

    dims, lr = CLS_DIMS, CLS_LR
    feats = _features(docs, dims).localCheckpoint(eager=False)
    n = feats.count()
    w = [0.0] * dims
    b = 0.0
    for _ in range(iterations):
        zdf = _old_with_weights(feats, w).select(
            "doc_id", "label", "dims", _old_z_col(b).alias("z")
        )
        scored = zdf.select(
            "doc_id",
            "dims",
            (
                (_old_sigmoid(F.col("z")) - F.col("label").cast("double"))
                * F.lit(float(_Q))
            ).cast("long").alias("qc"),
        )
        grad_rows = (
            scored.select(
                F.explode(F.concat(F.col("dims"), F.array(F.lit(-1)))).alias("dim"),
                "qc",
            )
            .groupBy("dim")
            .agg(F.sum("qc").alias("qg"))
            .collect()
        )
        for r in grad_rows:
            if r["dim"] == -1:
                b -= lr * (r["qg"] / _Q) / n
            else:
                w[r["dim"]] -= lr * (r["qg"] / _Q) / n
    zdf = _old_with_weights(feats, w).select("doc_id", "label", _old_z_col(b).alias("z"))
    sdf = zdf.select("doc_id", "label", _old_sigmoid(F.col("z")).alias("s"))
    return (
        sdf.select(
            "doc_id",
            "label",
            F.round("s", 6).alias("score"),
            (F.col("s") >= F.lit(float(threshold))).cast("int").alias("pred"),
        )
        .transform(lambda d: canonical_order(d, "doc_id"))
    )


# ---------------------------------------------------------------------------
# OLD: dsir (gram-row checkpoint, count-based models)
# ---------------------------------------------------------------------------


def old_dsir_select(docs):
    from docling_core_spark.operators.canon import canonical_order
    from docling_core_spark.operators.dsir import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        DSIR_K,
        DSIR_RATE,
        DSIR_SEED,
        _GUMBEL_MOD,
        _GUMBEL_SEED,
        _HASH60_MAX,
        _bucket_rows,
        _hash60,
    )

    buckets, alpha, rate, seed, k = (
        DSIR_BUCKETS,
        DSIR_ALPHA,
        DSIR_RATE,
        DSIR_SEED,
        DSIR_K,
    )
    rows = _bucket_rows(docs, buckets, "md5")
    rows = rows.localCheckpoint(eager=False)
    tgt_gate = _hash60(F.concat(F.col("doc_id").cast("string"), F.lit(seed)))
    tgt_rows = docs.filter(tgt_gate < F.lit(int(rate * _HASH60_MAX))).select("doc_id")
    target = (
        rows.join(F.broadcast(tgt_rows), "doc_id")
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    raw = rows.groupBy("bucket").agg(F.count("*").alias("cq"))
    target = target.localCheckpoint(eager=False)
    raw = raw.localCheckpoint(eager=False)
    consts = (
        target.agg(F.sum("ct").alias("nt"))
        .crossJoin(raw.agg(F.sum("cq").alias("nq")))
    )
    model = (
        raw.join(target, "bucket", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("nt") + F.lit(float(alpha * buckets)))
                )
                - F.log(
                    (F.col("cq") + F.lit(float(alpha)))
                    / (F.col("nq") + F.lit(float(alpha * buckets)))
                )
            ).alias("lr"),
        )
    )
    doc_counts = rows.groupBy("doc_id", "bucket").agg(F.count("*").alias("c"))
    weights = (
        doc_counts.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("log_ratio"))
    )
    weights = (
        docs.select("doc_id")
        .join(weights, "doc_id", "left")
        .select("doc_id", F.coalesce("log_ratio", F.lit(0.0)).alias("log_ratio"))
    )
    u = (
        F.pmod(
            _hash60(F.concat(F.col("doc_id").cast("string"), F.lit(_GUMBEL_SEED))),
            F.lit(_GUMBEL_MOD),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_MOD))
    keyed = weights.select(
        "doc_id",
        "log_ratio",
        F.round(F.col("log_ratio") + (-F.log(-F.log(u))), 6).alias("gumbel_key"),
    )
    keyed = keyed.localCheckpoint(eager=False)
    top = (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id")
        .withColumn("sel", F.lit(1))
    )
    return (
        keyed.join(F.broadcast(top), "doc_id", "left")
        .select(
            "doc_id",
            "log_ratio",
            "gumbel_key",
            F.coalesce("sel", F.lit(0)).alias("selected"),
        )
        .transform(lambda d: canonical_order(d, "doc_id"))
    )


# ---------------------------------------------------------------------------
# OLD: semdedup (interpreted pair self-join)
# ---------------------------------------------------------------------------


def old_semdedup(embeddings, eps=0.95, n_centroids=16, iterations=2, max_cluster_size=1024):
    from docling_core_spark.operators.canon import canonical_order
    from docling_core_spark.operators.dedup import cap_hot_buckets
    from docling_core_spark.operators.similarity import (
        _cosine,
        _quantized,
        kmeans_refined_centroids,
    )

    cents = kmeans_refined_centroids(embeddings, n_centroids, iterations)
    qvecs = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("qv")
    ).select("vec_id", F.transform(F.col("qv"), lambda v: v.cast("double")).alias("ev"))
    cent_row = F.broadcast(
        cents.agg(F.collect_list(F.struct("centroid_id", "cv")).alias("cent_arr"))
    )

    def _argmax_fold(acc, c):
        sim = _cosine(F.col("ev"), c["cv"])
        better = (sim > acc["best_sim"]) | (
            (sim == acc["best_sim"]) & (c["centroid_id"] < acc["best_id"])
        )
        return F.when(
            better,
            F.struct(sim.alias("best_sim"), c["centroid_id"].alias("best_id")),
        ).otherwise(acc)

    assigned = (
        qvecs.crossJoin(cent_row)
        .withColumn(
            "best",
            F.aggregate(
                F.col("cent_arr"),
                F.struct(
                    F.lit(-2.0).alias("best_sim"),
                    F.lit(None).cast("long").alias("best_id"),
                ),
                _argmax_fold,
            ),
        )
        .select(
            "vec_id",
            "ev",
            F.col("best.best_id").alias("cluster_id"),
            F.round(F.col("best.best_sim"), 5).alias("cent_sim"),
        )
        .localCheckpoint(eager=False)
    )
    capped = cap_hot_buckets(
        assigned.select("vec_id", "ev", "cluster_id", "cent_sim"),
        ("cluster_id",),
        max_cluster_size,
        id_col="vec_id",
    )
    a = capped.alias("a")
    b = capped.alias("b")
    removed = (
        a.join(b, "cluster_id")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .filter(
            (F.col("b.cent_sim") < F.col("a.cent_sim"))
            | (
                (F.col("b.cent_sim") == F.col("a.cent_sim"))
                & (F.col("b.vec_id") < F.col("a.vec_id"))
            )
        )
        .filter(F.round(_cosine(F.col("a.ev"), F.col("b.ev")), 5) >= F.lit(float(eps)))
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("removed", F.lit(1))
    )
    return (
        assigned.join(removed, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            "cent_sim",
            F.when(F.col("removed").isNull(), 1).otherwise(0).alias("keep"),
        )
        .transform(lambda d: canonical_order(d, "vec_id"))
    )


# ---------------------------------------------------------------------------
# OLD: bloom (mapInPandas per-row vstack)
# ---------------------------------------------------------------------------


def old_bloom_para_dedup(docs, ref_docs, m_bits=None, k=None, threshold=None):
    import numpy as np
    import pandas as pd

    from docling_core_spark.operators import bloom as B
    from docling_core_spark.operators.canon import canonical_order

    m_bits = m_bits or B.BLOOM_M_BITS
    k = k or B.BLOOM_K
    threshold = threshold or B.BLOOM_SEEN_THRESHOLD
    nbytes = m_bits // 8
    paras = B._paragraphs(ref_docs)
    pos_df = paras.select(B._positions(F.col("para"), m_bits, k).alias("pos"))

    def to_bits(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["pos"]])
            np.bitwise_or.at(bits, arr >> 3, (1 << (arr & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    part_rows = pos_df.mapInPandas(to_bits, "bits binary").rdd.map(lambda r: r["bits"])

    def _or(a, b):
        return (
            np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    zero = np.zeros(nbytes, dtype=np.uint8).tobytes()
    filt = part_rows.treeAggregate(zero, _or, _or, depth=2)

    bc = docs.sparkSession.sparkContext.broadcast(filt)
    outer = docs.select("doc_id", F.explode_outer(B._lines_expr()).alias("para"))
    with_pos = outer.select(
        "doc_id",
        F.when(
            F.col("para").isNotNull(), B._positions(F.col("para"), m_bits, k)
        ).alias("pos"),
    )

    def probe(batches):
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            mask = pdf["pos"].notna().to_numpy()
            vals = np.full(len(pdf), -1, dtype=np.int64)
            if mask.any():
                mat = np.vstack(
                    [np.asarray(a, dtype=np.int64) for a in pdf["pos"][mask]]
                )
                vals[mask] = (
                    (bits[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
                ).all(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "seen": pd.array(
                        [None if v < 0 else int(v) for v in vals], dtype="Int32"
                    ),
                }
            )

    flags = with_pos.mapInPandas(probe, "doc_id long, seen int")
    agg = flags.groupBy("doc_id").agg(
        F.count("seen").cast("long").alias("n_paras"),
        F.coalesce(F.sum("seen"), F.lit(0)).cast("long").alias("n_seen"),
    )
    ratio = F.col("n_seen") / F.greatest(F.col("n_paras"), F.lit(1))
    return agg.select(
        "doc_id",
        "n_paras",
        "n_seen",
        F.round(ratio, 6).alias("seen_frac"),
        (ratio < F.lit(float(threshold))).alias("keep"),
    ).transform(lambda d: canonical_order(d, "doc_id"))


# ---------------------------------------------------------------------------
# OLD: minhash (corpus-wide shingle verify, no semi-join)
# ---------------------------------------------------------------------------


def old_minhash_lsh_duplicates(
    docs, num_hashes=32, bands=8, shingle_n=3, jaccard_threshold=0.8, max_bucket_size=256
):
    from docling_core_spark.operators.canon import canonical_order
    from docling_core_spark.operators.dedup import (
        cap_hot_buckets,
        minhash_signatures,
        norm_words,
        shingle_grams,
    )

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
    banded = cap_hot_buckets(banded, ("band", "bucket"), max_bucket_size)
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = docs.select("doc_id", norm_words(F.col("text")).alias("w")).select(
        "doc_id", F.array_distinct(shingle_grams(F.col("w"), shingle_n)).alias("sh")
    )
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
        .transform(lambda d: canonical_order(d, "doc_a", "doc_b"))
    )
    return verified


# ---------------------------------------------------------------------------
# OLD: fineweb_prep (no pushdown barriers)
# ---------------------------------------------------------------------------


def old_fineweb_prep(docs_with_url, min_stopword_hits=1):
    from docling_core_spark.operators.canon import canonical_order
    from docling_core_spark.operators.pii import pii_redact
    from docling_core_spark.operators.textstats import (
        c4_line_filter,
        gopher_quality_filter,
        text_clean,
        url_filter,
    )

    kept_url = url_filter(
        docs_with_url, canonical=False, passthrough=("text",)
    ).filter(F.col("keep"))
    cleaned = text_clean(
        kept_url.select("doc_id", "url", "text"),
        canonical=False,
        passthrough=("url",),
    )
    quality = gopher_quality_filter(
        cleaned.select("doc_id", "url", F.col("clean_text").alias("text")),
        canonical=False,
        passthrough=("url", "text"),
        min_stopword_hits=min_stopword_hits,
    ).filter(F.col("keep"))
    lined = c4_line_filter(
        quality.select("doc_id", "url", "text", "n_words"),
        canonical=False,
        passthrough=("url", "n_words"),
    ).filter((F.col("n_kept_lines") > 0) & F.col("doc_ok"))
    fingered = lined.withColumn(
        "fingerprint",
        F.md5(F.regexp_replace(F.lower(F.col("filtered_text")), r"[^a-z0-9]", "")),
    )
    rep = F.min_by(
        F.struct("doc_id", "url", "filtered_text", "n_words", "n_lines", "n_kept_lines"),
        "doc_id",
    )
    survivors = (
        fingered.groupBy("fingerprint")
        .agg(rep.alias("r"))
        .select(
            F.col("r.doc_id").alias("doc_id"),
            F.col("r.url").alias("url"),
            F.col("r.filtered_text").alias("text"),
            F.col("r.n_words").alias("n_words"),
            F.col("r.n_lines").alias("n_lines"),
            F.col("r.n_kept_lines").alias("n_kept_lines"),
            "fingerprint",
        )
    )
    redacted = pii_redact(
        survivors,
        canonical=False,
        passthrough=("url", "n_words", "n_lines", "n_kept_lines", "fingerprint"),
    )
    return redacted.select(
        "doc_id",
        "url",
        "n_words",
        "n_lines",
        "n_kept_lines",
        "fingerprint",
        "redacted_text",
        "n_emails",
        "n_ips",
        "n_phones",
        "any_pii",
    ).transform(lambda d: canonical_order(d, "doc_id"))


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ops = sys.argv[3:] or ["classifier", "dsir", "semdedup", "bloom", "minhash", "fineweb"]

    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="ab-r9", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from docling_core_spark.operators import (
        bloom,
        classifier,
        dedup,
        dsir,
        fineweb,
        similarity,
        textstats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(64).cache()
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(32).cache()
    emb.count()

    def bloom_corpus():
        return dedup.with_synthetic_duplicates(textstats.c4_demo_docs(docs))

    pairs = {
        "classifier": (
            lambda: old_classifier_score(docs, iterations=4).count(),
            lambda: classifier.classifier_score(docs, iterations=4).count(),
        ),
        "dsir": (
            lambda: old_dsir_select(docs).count(),
            lambda: dsir.dsir_select(docs).count(),
        ),
        "semdedup": (
            lambda: old_semdedup(similarity.with_synthetic_duplicate_vectors(emb)).count(),
            lambda: similarity.semdedup(similarity.with_synthetic_duplicate_vectors(emb)).count(),
        ),
        "bloom": (
            lambda: old_bloom_para_dedup(
                bloom_corpus(), bloom_corpus().filter(F.col("doc_id") % 3 == 0)
            ).count(),
            lambda: bloom.bloom_para_dedup(
                bloom_corpus(), bloom_corpus().filter(F.col("doc_id") % 3 == 0)
            ).count(),
        ),
        "minhash": (
            lambda: old_minhash_lsh_duplicates(docs).count(),
            lambda: dedup.minhash_lsh_duplicates(docs).count(),
        ),
        "fineweb": (
            lambda: old_fineweb_prep(fineweb.fineweb_demo_docs(docs)).count(),
            lambda: fineweb.fineweb_prep(fineweb.fineweb_demo_docs(docs)).count(),
        ),
    }

    for op in ops:
        old_fn, new_fn = pairs[op]
        # warm both paths once
        old_fn()
        new_fn()
        olds, news = [], []
        for r in range(rounds):
            t0 = time.perf_counter()
            old_fn()
            olds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            new_fn()
            news.append(time.perf_counter() - t0)
        fmt = lambda xs: "[" + ", ".join(f"{x:.2f}" for x in xs) + "]"
        print(
            f"{op}: old {fmt(olds)} best {min(olds):.3f} | "
            f"new {fmt(news)} best {min(news):.3f} | "
            f"speedup(best) {min(olds) / min(news):.2f}x  loadavg={os.getloadavg()[0]:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
