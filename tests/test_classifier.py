"""Quality classifier (operators/classifier.py).

Oracle value-parity (Spark == pure-python twin, bit-exact weights and
scores) runs in tests/test_oracle_parity.py; this module pins semantics
and the scale shape:
- the trained model beats the majority-class baseline on its own labels
  (the training signal is real, not noise);
- scoring is map-side: broadcast weight row, no Window, no sort-merge
  join, gradient aggregation keeps map-side partials;
- empty corpus trains a zero model without crashing;
- iterations are reproducible (two runs, identical weights).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_core_spark.operators.classifier import (
    classifier_score,
    classifier_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_beats_majority_baseline(docs):
    rows = classifier_score(docs).collect()
    n = len(rows)
    pos = sum(r["label"] for r in rows)
    majority = max(pos, n - pos) / n
    acc = sum(1 for r in rows if r["pred"] == r["label"]) / n
    assert acc > majority


def test_score_plan_shape(docs):
    plan = _plan(classifier_score(docs, iterations=1))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    # r9: scoring is one Arrow pass (weights ship as an sc.broadcast read by
    # the python stage) — no join of any kind on the scoring path
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_train_partial_agg(docs):
    # r9: the gradient pass emits per-partition (dim, qg) partials from one
    # Arrow stage; the tiny dim rollup behind it still gets map-side
    # partial aggregation
    from docling_core_spark.operators.classifier import _features, _grad_partials

    feats = _features(docs, 256)
    plan = _plan(
        _grad_partials(feats, [0.0] * 256, 0.0).groupBy("dim").agg(F.sum("qg"))
    )
    assert "partial_sum" in plan
    assert "MapInPandas" in plan


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    model = classifier_train(empty, dims=64, iterations=2).collect()
    # zero gradient everywhere: only the bias row remains, at 0.0
    assert [(r["dim"], r["weight"]) for r in model] == [(-1, 0.0)]
    assert classifier_score(empty, dims=64, iterations=2).count() == 0


def test_deterministic(docs):
    sample = docs.limit(50)
    a = classifier_train(sample, dims=128, iterations=3).collect()
    b = classifier_train(sample, dims=128, iterations=3).collect()
    assert a == b


def test_pretrained_model_path(spark):
    rows = [(1, "the cat sat"), (2, "qq zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = classifier_score(df, dims=16, model=([0.0] * 16, 2.0)).collect()
    # bias 2.0, zero weights: sigma(2) = 0.5*(1+2/3) = 0.833333 for every doc
    assert all(r["score"] == 0.833333 and r["pred"] == 1 for r in out)
