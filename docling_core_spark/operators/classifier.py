"""Document quality classifier: distributed training of a fastText-style
linear model over hashed bag-of-words features.

The GPT-3 / LLaMA data pipelines train a linear quality classifier on a
trusted-positive corpus and score every crawl document with it (Brown et
al. 2020 Appendix A: logistic regression over hashed features; Touvron et
al. 2023 §2: fastText-like quality model).  Those rely on pretrained
fastText binaries (env-blocked here); this module trains the same model
CLASS from scratch, distributed, with deterministic weak-supervision
labels so every run — Spark or the single-process oracle — reproduces the
identical weights bit-for-bit.

Cross-engine determinism (the oracle-ability contract):
- features are BINARY hashed bag-of-words: dim = md5-60(token) mod D,
  per-doc dims sorted distinct — the per-doc score folds left-to-right
  over a sorted int array, so float accumulation order is fixed;
- the link is the ALGEBRAIC sigmoid s(z) = 0.5*(1 + z/(1+|z|)): only
  +,*,/,abs — IEEE-754 bit-exact across JVM and CPython, unlike exp;
- per-doc gradient contributions quantize to 1e-9-unit longs (double→long
  cast truncates toward zero in both engines) before the cross-partition
  sum, so the reduction is EXACT integer arithmetic in any order;
- the weight update runs driver-side in python in both paths.

Scale shape (100 TB):
- the feature frame is built once (one scan) and localCheckpoint'ed;
- per iteration: one-row broadcast of the weight array (crossJoin — the
  k-means/IVF pattern), map-side score fold, ONE dim hash-aggregation
  with map-side partials, <=D rows of driver traffic (same class as
  k-means centroids; D=2^18 ~ 2 MB);
- scoring is a single map-side pass: broadcast weights, fold, no shuffle
  beyond the trailing canonical sort.  No windows, no content shuffle.
- at D >= 2^20 the documented alternative is exploding (doc_id, dim) rows
  against a broadcast (dim, qweight) table — quantized-long sums keep the
  same exactness; the one-row-array fold is preferred while the array
  broadcasts comfortably.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Row, functions as F

from docling_core_spark.operators.canon import canonical_order
from docling_core_spark.operators.dedup import norm_words
from docling_core_spark.operators.textstats import lang_score_expr

#: hashed feature dimensions (oracle-scale default; 2^18 at crawl scale)
CLS_DIMS = 4096
CLS_ITERATIONS = 8
CLS_LR = 0.5
#: weak-supervision label: "quality" = any en-stopword hit AND >= this many words
CLS_MIN_WORDS = 40
_Q = 1_000_000_000  # gradient quantization grid (1e-9 units)


def _features(docs: DataFrame, dims: int) -> DataFrame:
    """(doc_id, label, dims: sorted distinct int array) — binary hashed BoW.

    label is the deterministic weak signal (1 = quality): >=1 distinct en
    stopword AND >= CLS_MIN_WORDS normalized words — not a claim about
    true quality, just a reproducible balanced target computable
    identically in Spark and pure python.

    NULL text coalesces to "" FIRST (the twin's `text or ""`): without it
    Spark would carry NULL dims/labels — the doc silently drops from the
    gradients while the twin scores it, breaking bit-for-bit lockstep.
    The token array materializes into its own projection (no-CSE rule)
    and the label's word count reads that attribute, not a second
    norm_words evaluation."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    base = docs.select("doc_id", txt.alias("t")).select(
        "doc_id",
        "t",
        F.filter(norm_words(F.col("t")), lambda x: x != F.lit("")).alias("ws"),
    )
    label = (
        (lang_score_expr(F.col("t"), "en") >= 1)
        & (F.size("ws") >= F.lit(CLS_MIN_WORDS))
    ).cast("int")
    dim_of = F.transform(
        F.col("ws"),
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"), F.lit(dims)
        ).cast("int"),
    )
    return base.select(
        "doc_id", label.alias("label"), F.array_sort(F.array_distinct(dim_of)).alias("dims")
    )


def _with_weights(feats: DataFrame, w: list[float]) -> DataFrame:
    """crossJoin ONE broadcast row carrying the weight array (the k-means/
    IVF one-row-broadcast pattern — keeps the plan free of a |D|-literal
    expression tree and ships the array once per executor)."""
    spark = feats.sparkSession
    wrow = spark.createDataFrame([(w,)], "warr array<double>")
    return feats.crossJoin(F.broadcast(wrow))


def _z_col(bias: float):
    """Left-to-right fold of the sorted dims against the broadcast weight
    array attribute: the linear term z.  Callers MUST materialize this
    into its own projection before referencing it more than once — the
    interpreted HOF fold gets no common-subexpression elimination (the
    round-6 no-CSE rule), so an expression like sigmoid(z) would run the
    whole O(|dims|) fold twice per row."""
    return F.aggregate(
        F.col("dims"),
        F.lit(float(bias)),
        lambda acc, d: acc + F.element_at(F.col("warr"), d + 1),
    )


def _sigmoid(z):
    """Algebraic sigmoid over a MATERIALIZED z attribute (deterministic;
    see module docstring)."""
    return F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))


def _train(
    docs: DataFrame,
    dims: int,
    iterations: int,
    lr: float,
):
    """Returns (weights list[float], bias float, n_docs, feature frame)."""
    feats = _features(docs, dims).localCheckpoint(eager=False)
    n = feats.count()
    w = [0.0] * dims
    b = 0.0
    if n == 0:
        return w, b, 0, feats
    for _ in range(iterations):
        # z materializes into its own projection first (no-CSE: the fold
        # would otherwise re-run per reference inside the sigmoid)
        zdf = _with_weights(feats, w).select(
            "doc_id", "label", "dims", _z_col(b).alias("z")
        )
        scored = zdf.select(
            "doc_id",
            "dims",
            (
                (_sigmoid(F.col("z")) - F.col("label").cast("double"))
                * F.lit(float(_Q))
            ).cast("long").alias("qc"),
        )
        # ONE action per iteration: the bias gradient rides the same dim
        # aggregation under sentinel dim -1 (each doc contributes its qc
        # exactly once there, so sum(qg at -1) == sum(qc) — identical math
        # to a separate global agg, half the driver round trips)
        grad_rows = (
            scored.select(
                F.explode(
                    F.concat(F.col("dims"), F.array(F.lit(-1)))
                ).alias("dim"),
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
    return w, b, n, feats


def classifier_train(
    docs: DataFrame,
    dims: int = CLS_DIMS,
    iterations: int = CLS_ITERATIONS,
    lr: float = CLS_LR,
) -> DataFrame:
    """The trained model as a relation: (dim, weight) for every nonzero
    weight, plus one (dim=-1, bias) row.  Weights rounded at 1e-6 for the
    driver boundary; the scoring path uses the exact values."""
    spark = docs.sparkSession
    w, b, _, _ = _train(docs, dims, iterations, lr)
    rows = [Row(dim=d, weight=float(x)) for d, x in enumerate(w) if x != 0.0]
    rows.append(Row(dim=-1, weight=float(b)))
    out = spark.createDataFrame(rows, "dim int, weight double").select(
        "dim", F.round("weight", 6).alias("weight")
    )
    return out.transform(lambda d: canonical_order(d, "dim"))


def classifier_score(
    docs: DataFrame,
    dims: Optional[int] = None,
    iterations: int = CLS_ITERATIONS,
    lr: float = CLS_LR,
    threshold: float = 0.5,
    model: Optional[tuple[list[float], float]] = None,
) -> DataFrame:
    """(doc_id, label, score, pred): train (or take `model`), then score
    every document map-side — broadcast weights, fold, no shuffle.

    With an explicit ``model``, ``dims`` defaults to ``len(weights)`` —
    hashing features at a different dimensionality than the model was
    trained at would score against misaligned weight slots (silently wrong
    when smaller, ANSI ARRAY_INDEX_OUT_OF_BOUNDS when larger), so a
    mismatch raises.  The train path reuses the checkpointed feature frame
    from training instead of re-scanning the corpus."""
    if model is None:
        w, b, _, feats = _train(
            docs, dims if dims is not None else CLS_DIMS, iterations, lr
        )
    else:
        w, b = model
        if dims is None:
            dims = len(w)
        elif dims != len(w):
            raise ValueError(
                f"dims={dims} but the model has {len(w)} weights; "
                "score with the dims the model was trained at"
            )
        feats = _features(docs, dims)
    zdf = _with_weights(feats, w).select(
        "doc_id", "label", _z_col(b).alias("z")
    )
    sdf = zdf.select("doc_id", "label", _sigmoid(F.col("z")).alias("s"))
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
# Pure-python twin (the single-process-expected oracle runs this; keep in
# LOCKSTEP with the Spark path above)
# ---------------------------------------------------------------------------


def py_label(text: str, norm_words_fn) -> int:
    padded = " " + (text or "").lower() + " "
    hits = sum(1 for sw in ("the", "and", "of", "to", "in", "is") if f" {sw} " in padded)
    n_words = len([t for t in norm_words_fn(text) if t])
    return 1 if hits >= 1 and n_words >= CLS_MIN_WORDS else 0


def py_dims(text: str, dims: int, norm_words_fn) -> list[int]:
    import hashlib

    ds = {
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dims
        for t in norm_words_fn(text)
        if t
    }
    return sorted(ds)


def py_train_score(
    doc_rows: list[tuple[int, str]],
    dims: int = CLS_DIMS,
    iterations: int = CLS_ITERATIONS,
    lr: float = CLS_LR,
    norm_words_fn=None,
):
    """Identical arithmetic, single-process: returns (weights, bias,
    [(doc_id, label, score)])."""

    def sig(z: float) -> float:
        return 0.5 * (1.0 + z / (1.0 + abs(z)))

    feats = [
        (doc_id, py_label(text, norm_words_fn), py_dims(text, dims, norm_words_fn))
        for doc_id, text in doc_rows
    ]
    n = len(feats)
    w = [0.0] * dims
    b = 0.0
    for _ in range(iterations):
        grad: dict[int, int] = {}
        qb = 0
        for _doc, label, ds in feats:
            z = b
            for d in ds:
                z = z + w[d]
            qc = int((sig(z) - float(label)) * _Q)
            qb += qc
            for d in ds:
                grad[d] = grad.get(d, 0) + qc
        for d, qg in grad.items():
            w[d] -= lr * (qg / _Q) / n
        b -= lr * (qb / _Q) / n
    scores = []
    for doc_id, label, ds in feats:
        z = b
        for d in ds:
            z = z + w[d]
        scores.append((doc_id, label, sig(z)))
    return w, b, scores
