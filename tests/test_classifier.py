"""Naive-Bayes classifier invariants (functions/classifier.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

import pipelinewise_spark.functions.classifier as C


def _corpus(spark):
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "alpha beta beta gamma", "en"))
        else:
            rows.append((i, "uno dos dos tres", "es"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_separable_corpus_classifies_perfectly(spark):
    docs = _corpus(spark)
    train = docs.filter(F.col("doc_id") < 30)
    ev = docs.filter(F.col("doc_id") >= 30)
    model = C.nb_train(train, "lang", "text")
    pred = C.nb_predict(C.nb_score(ev, model, "doc_id", "text"), "doc_id")
    got = {
        r["doc_id"]: r["predicted"]
        for r in pred.collect()
    }
    want = {r["doc_id"]: r["lang"] for r in ev.collect()}
    assert got == want
    # scores are exact integers (micro-logs) — the engine-parity contract
    assert dict(pred.dtypes)["score"] == "bigint"


def test_unseen_features_cost_the_laplace_floor(spark):
    docs = _corpus(spark)
    model = C.nb_train(docs, "lang", "text")
    probe = spark.createDataFrame(
        [(99, "zzzz qqqq")], "doc_id long, text string"
    )
    scores = {
        r["label"]: r["score"]
        for r in C.nb_score(probe, model, "doc_id", "text").collect()
    }
    labels = {
        r["label"]: r
        for r in model["labels"].collect()
    }
    # all features unseen: score == prior + len * llr0, exactly
    for lab, s in scores.items():
        assert s == labels[lab]["prior"] + 2 * labels[lab]["llr0"]


def test_argmax_tie_breaks_to_smallest_label(spark):
    # two labels with literally identical token distributions
    rows = [(0, "x y", "b"), (1, "x y", "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = C.nb_train(docs, "lang", "text")
    pred = C.nb_predict(
        C.nb_score(
            spark.createDataFrame([(9, "x y")], "doc_id long, text string"),
            model, "doc_id", "text",
        ),
        "doc_id",
    ).first()
    assert pred["predicted"] == "a"


def test_semantic_decontaminate_broadcasts_eval_side(spark, sf_dir):
    from pipelinewise_spark.queries import QUERIES

    df = QUERIES["semantic_decontaminate_embeddings"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval side is benchmark-sized
