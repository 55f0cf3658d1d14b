"""int8 embedding quantization: bounded cosine error, high recall vs the
exact float path, zero-vector safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelinewise_spark.functions.similarity import (
    cosine,
    cosine_quantized,
    cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from pipelinewise_spark.sources.files import read_table


def test_quantized_cosine_error_bounded(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").limit(100)
    q = quantize_embeddings(emb, "embedding")
    pairs = (
        q.alias("a")
        .crossJoin(q.alias("b"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .limit(500)
        .select(
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("exact"),
            cosine_quantized(
                F.col("a.q"), F.col("a.q_scale"),
                F.col("b.q"), F.col("b.q_scale"),
            ).alias("approx"),
        )
    )
    worst = pairs.agg(
        F.max(F.abs(F.col("exact") - F.col("approx")))
    ).collect()[0][0]
    # int8 symmetric quantization of unit-ish vectors: cosine error << 1%
    assert worst < 0.01, worst


def test_quantized_topk_recall(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in quantized_cosine_topk(
            emb, queries, "vec_id", "embedding", k=5
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_zero_vector_quantizes_safely(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: (r["q"], r["q_scale"]) for r in
           quantize_embeddings(df, "embedding").collect()}
    assert out[1][0] == [0, 0, 0] and out[1][1] == 0.0
    assert out[2][0][1] == -127  # max-magnitude component hits the rail
