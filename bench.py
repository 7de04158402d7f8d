"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {name: sec},
   "sf": ..., "extra": {...}}

The flagship number is the end-to-end extraction pipeline (HTML -> doc tree ->
markdown + text + hybrid chunks) in docs/sec; the other entries cover the
training-data operators.
"""

from __future__ import annotations

import json
import os
import sys
import time


def wait_for_quiet_host(
    threshold: float = 2.0, max_wait_s: int = 900, poll_s: int = 30
) -> dict:
    """Refuse to start timing on a contended host: sleep-retry until the
    1-min loadavg drops under `threshold` (or the wait budget runs out).

    The round-5 bench was recorded at loadavg 19.7 and its regressions were
    all noise (the repo's own finding: benches are only valid quiet) — this
    gate makes the committed artifact self-certifying instead of relying on
    a README caveat.  Records the decision either way; set
    SPARK_GRAFT_BENCH_NO_WAIT=1 to skip (e.g. for smoke runs).
    """
    decision = {"quiet_gate_threshold": threshold, "quiet_gate_waited_s": 0}
    if os.environ.get("SPARK_GRAFT_BENCH_NO_WAIT") == "1":
        decision["quiet_gate"] = "skipped (SPARK_GRAFT_BENCH_NO_WAIT)"
        return decision
    waited = 0
    load = os.getloadavg()[0]
    while load > threshold and waited < max_wait_s:
        print(
            f"[bench] host busy (loadavg {load:.1f} > {threshold}); "
            f"waiting {poll_s}s ({waited}/{max_wait_s}s used)",
            file=sys.stderr,
        )
        time.sleep(poll_s)
        waited += poll_s
        load = os.getloadavg()[0]
    decision["quiet_gate_waited_s"] = waited
    decision["quiet_gate"] = (
        "quiet" if load <= threshold else f"gave up contended (loadavg {load:.1f})"
    )
    return decision


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    quiet = wait_for_quiet_host()

    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="docling-core-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from docling_core_spark.operators import dedup, profile, relational, similarity, textstats
    from docling_core_spark.operators.extract import extract_pages, split_skew
    from docling_core_spark.sources.web_pages import web_pages_df

    # The sf parquet is a single small file = one input split, which would run
    # every pre-shuffle stage on one core.  On a real cluster the scan arrives
    # in many splits; spread the benchmark input accordingly (2 tasks/core).
    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(2 * cpus).cache()
    emb_tbl = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(cpus).cache()
    n_docs = docs_tbl.count()
    emb_tbl.count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {"n_docs": n_docs, "cpus": cpus}
    # shared-host noise diagnostic: interpret absolute numbers in context
    extra["loadavg_start"] = round(os.getloadavg()[0], 2)
    extra.update(quiet)

    def timed(name: str, fn, repeats: int = 2) -> None:
        # best-of-N for every query (noisy-host guard): a single window can
        # catch a neighbor's burst — r3 observed a 3.5x swing on one query
        # between two same-code runs minutes apart; r5 observed 10-17x on
        # sub-second queries during a sustained neighbor phase, so cheap
        # (sub-second) queries get an extra escape attempt when the first
        # two disagree wildly
        best = None
        for attempt in range(repeats + 2):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # after the budgeted repeats, take up to 2 extra attempts only
            # for cheap queries whose last sample still disagrees >2.5x with
            # the best (a neighbor burst mid-window)
            if attempt >= repeats - 1 and not (best <= 2.0 and dt > best * 2.5):
                break
        timings[name] = round(best, 3)

    # The flagship measures what a production job does: scan a crawl table
    # from storage -> extract (per BASELINE input_hint).  Page synthesis is
    # input prep, not pipeline throughput — materialize it once (cached per
    # package digest so code edits invalidate).
    from pyspark.sql import functions as F

    from docling_core_spark.oracle_expected import package_digest

    # 4x-replicated crawl table (same protocol as scripts/scaling_bench.py):
    # at sf0.1 a single pass is ~1.3 s of compute wrapped in ~1.3 s of fixed
    # job/stage overhead, which misreads steady-state throughput by ~2x
    replication = 4
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    pages_path = f"/tmp/bench_web_pages_{sf_name}_x{replication}_{package_digest()}.parquet"
    if not os.path.isdir(pages_path):
        pages = web_pages_df(spark, sf_dir)
        many = pages
        for i in range(1, replication):
            many = many.unionByName(
                pages.withColumn("url", F.concat(F.lit(f"r{i}-"), F.col("url")))
            )
        many.repartition(4 * cpus, "url").write.mode("overwrite").parquet(pages_path)

    # Warm-up: fork the python workers and import the package on EVERY core
    # BEFORE the timed flagship run (same protocol as scripts/scaling_bench.py).
    # Without it the first-UDF worker spin-up dominates a short window and the
    # headline reads ~4x below steady state (round-1 lesson).
    bench_pages = spark.read.parquet(pages_path)
    extract_pages(split_skew(bench_pages), chunker="hybrid", emit_doc_json=False).select(
        "url"
    ).write.format("noop").mode("overwrite").save()

    # flagship: full extraction pipeline (parse + markdown + text + chunks)
    def run_extract() -> None:
        extracted = extract_pages(split_skew(bench_pages), chunker="hybrid", emit_doc_json=False)
        stats = extracted.select(
            "url", "error", "chunks"
        ).selectExpr("count(*) AS n", "sum(size(chunks)) AS nc", "count(error) AS ne").first()
        extra["extract_pages"] = stats["n"]
        extra["extract_chunks"] = int(stats["nc"] or 0)
        extra["extract_errors"] = stats["ne"]

    # flagships get best-of-3: they dominate the suite wall and the r7 bench
    # showed a single contended draw can misread the full-format path by 50%
    timed("extract_pipeline", run_extract, repeats=3)
    extra["extract_docs_per_sec"] = round(
        replication * n_docs / timings["extract_pipeline"], 2
    )

    # second flagship: every serializer on (markdown + text + html + doctags
    # + doclang + doc json) — what the driver's extract_* queries actually
    # exercise per row
    def run_extract_full() -> None:
        extracted = extract_pages(
            split_skew(bench_pages),
            chunker="hybrid",
            emit_doc_json=True,
            emit_html=True,
            emit_doctags=True,
            emit_doclang=True,
        )
        stats = extracted.selectExpr(
            "count(*) AS n", "count(error) AS ne", "sum(length(doctags)) AS dt"
        ).first()
        extra["extract_full_pages"] = stats["n"]
        extra["extract_full_errors"] = stats["ne"]

    timed("extract_pipeline_full_formats", run_extract_full, repeats=3)
    extra["extract_full_docs_per_sec"] = round(
        replication * n_docs / timings["extract_pipeline_full_formats"], 2
    )

    timed("dedup_exact", lambda: dedup.exact_duplicates(docs_tbl).count())
    timed("dedup_minhash_lsh", lambda: dedup.minhash_lsh_duplicates(docs_tbl).count())
    timed("dedup_simhash", lambda: dedup.simhash_duplicates(docs_tbl).count())
    timed("textstats_quality", lambda: textstats.quality_scores(docs_tbl).count())
    timed("gopher_filter", lambda: textstats.gopher_quality_filter(docs_tbl).count())
    timed("repetition_scores", lambda: textstats.repetition_scores(docs_tbl).count())
    timed("language_id", lambda: textstats.language_id(docs_tbl).count())
    # round-6 operators: PII scrub, benchmark decontamination, global span
    # dedup, winnowing fingerprints, host rollup
    from docling_core_spark.operators import decontam, pii

    timed("pii_redact", lambda: pii.pii_redact(pii.pii_demo_docs(docs_tbl)).count())
    timed(
        "decontaminate",
        lambda: decontam.decontaminate(docs_tbl, decontam.eval_subset(docs_tbl)).count(),
    )
    # round-8 operators: CCNet LM perplexity scoring + exact-substring dedup
    from docling_core_spark.operators import lm

    timed("lm_perplexity", lambda: lm.lm_score(docs_tbl).count())
    from docling_core_spark.operators import dsir

    timed("dsir_select", lambda: dsir.dsir_select(docs_tbl).count())
    from docling_core_spark.operators import classifier

    timed(
        "quality_classifier",
        lambda: classifier.classifier_score(docs_tbl, iterations=4).count(),
        repeats=1,
    )
    timed(
        "exact_substring_dedup",
        lambda: dedup.exact_substring_dedup(
            dedup.with_synthetic_duplicates(docs_tbl)
        ).count(),
    )
    timed(
        "c4_span_dedup",
        lambda: textstats.c4_span_dedup(
            dedup.with_synthetic_duplicates(textstats.c4_demo_docs(docs_tbl))
        ).count(),
    )
    from docling_core_spark.operators import bloom

    def _bloom_run():
        corpus = dedup.with_synthetic_duplicates(textstats.c4_demo_docs(docs_tbl))
        return bloom.bloom_para_dedup(
            corpus, corpus.filter(F.col("doc_id") % 3 == 0)
        ).count()

    timed("bloom_para_dedup", _bloom_run)
    from docling_core_spark.operators import fineweb

    timed(
        "fineweb_prep",
        lambda: fineweb.fineweb_prep(fineweb.fineweb_demo_docs(docs_tbl)).count(),
    )
    timed(
        "url_filter",
        lambda: textstats.url_filter(
            docs_tbl.select(
                "doc_id",
                textstats.url_filter_demo_expr(F.col("doc_id")).alias("url"),
            )
        ).count(),
    )
    timed(
        "winnowing_fingerprints",
        lambda: textstats.winnowing_fingerprints(docs_tbl).count(),
    )
    timed(
        "host_quality_stats",
        lambda: textstats.host_quality_stats(textstats.host_demo_docs(docs_tbl)).count(),
    )
    timed("similarity_cosine_topk", lambda: similarity.cosine_topk(emb_tbl).collect())
    timed(
        "semdedup",
        lambda: similarity.semdedup(
            similarity.with_synthetic_duplicate_vectors(emb_tbl)
        ).count(),
    )
    timed("similarity_ann_lsh", lambda: similarity.ann_lsh_topk(emb_tbl).collect())
    timed("profile_collection", lambda: profile.collection_stats(docs_tbl).collect())
    # round-4 operators: multi-language code chunking + SVG overlay rendering
    # (map-only mapInPandas over synthesized per-doc inputs)
    from docling_core_spark.operators.doc_synth_ops import code_chunks, visualize_svg_op

    timed("code_chunks_java", lambda: code_chunks(docs_tbl, lang="java").count())
    timed("code_chunks_c", lambda: code_chunks(docs_tbl, lang="c").count())
    timed("visualize_svg", lambda: visualize_svg_op(docs_tbl).count())

    timed("rel_pricing_summary", lambda: relational.pricing_summary(spark, sf_dir).collect())
    timed("rel_top_customers", lambda: relational.top_customers(spark, sf_dir).collect())

    # round-8 first-mile operators: PDF layout parse (page-range split path)
    # and DOM-heuristic main-content scoring over the replicated pages table
    from docling_core_spark.operators.boilerplate import main_content_df
    from docling_core_spark.sources.pdf import demo_pdf_dir, pdf_pages_df

    pdf_dir = demo_pdf_dir(sf_dir)
    timed(
        "pdf_extract",
        lambda: pdf_pages_df(spark, pdf_dir + "/*.pdf", split_pages=8).count(),
    )
    timed(
        "main_content",
        lambda: main_content_df(
            bench_pages,
            stopwords_low=0.0,
            stopwords_high=0.0,
            length_low=25,
            length_high=120,
        ).selectExpr("sum(n_good)").first(),
    )

    # attach the latest N-vs-4N scaling measurement if present
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        extra["scaling_efficiency_n_vs_4n"] = sc.get("scaling_efficiency_n2_vs_n8")
        extra["scaling_gate_passed"] = sc.get("passed")

    extra["loadavg_end"] = round(os.getloadavg()[0], 2)
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (flagship: HTML->doc->markdown+chunks extraction)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
