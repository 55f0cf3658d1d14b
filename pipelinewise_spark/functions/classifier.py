"""Model-based curation: a multinomial Naive-Bayes text classifier
trained and scored entirely in-engine.

The fastText/CCNet-style model-based filter every LLM curation pipeline
runs (language ID, quality gating) — here as pure DataFrame aggregates:
TRAIN is two groupBys over exploded token features (count per
(label, feature), total per label, priors), SCORE is one broadcast-join
of the document features against the likelihood table plus the standard
sparse-NB identity

    score(d, y) = prior(y) + Σ_seen llr(t, y) · n(d, t)
                + (|d| − seen(d, y)) · llr0(y)

so unseen features cost an answer-sized correction instead of a dense
|V|×|labels| join — the formulation that survives a 100 TB corpus (the
likelihood table is vocabulary-sized and Zipf-small; the corpus is
touched once to explode features and once to aggregate scores).

Engine-portable scoring: log-likelihoods are quantized to BIGINT
micro-logs (``round(ln(p)·1e6)``) the moment they are computed. The
probability inputs are exact IEEE divisions of exact integers
(identical in any engine), so after quantization every downstream sum
and argmax is INTEGER arithmetic — bit-identical between Spark and the
DuckDB oracle, immune to the last-ulp drift a float log-sum carries
(same trick family as the temperature-sampling cross-multiplication).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: character prefix length of each whitespace token used as the feature —
#: gives partial feature overlap for unsegmented scripts too
FEAT_PREFIX = 4


def _features(df: DataFrame, text_col: str) -> DataFrame:
    """(…, feat, n) — whitespace tokens, lowercased, truncated to
    FEAT_PREFIX chars, with per-document multiplicities."""
    tok = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        )
    )
    return (
        df.select("*", tok.alias("__tok"))
        .withColumn("feat", F.substring(F.col("__tok"), 1, FEAT_PREFIX))
        .drop("__tok")
    )


def _microlog(c: F.Column) -> F.Column:
    return F.round(F.log(c) * 1e6).cast("long")


def nb_train(
    train: DataFrame, label_col: str, text_col: str
) -> dict[str, DataFrame]:
    """Multinomial NB with Laplace smoothing. Returns the model as three
    answer-sized frames: ``likelihood`` (label, feat, llr BIGINT),
    ``labels`` (label, prior BIGINT, llr0 BIGINT — the unseen-feature
    log-likelihood), and the scalar vocabulary size (carried on labels)."""
    feats = _features(train, text_col).groupBy(label_col, "feat").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    feats = feats.withColumnRenamed(label_col, "label")
    vocab = feats.select("feat").distinct().count()
    totals = feats.groupBy("label").agg(F.sum("cnt").alias("tot"))
    docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("ndocs")
    )
    ntotal = train.count()
    labels = totals.join(docs, "label").select(
        "label",
        _microlog(F.col("ndocs") / F.lit(ntotal)).alias("prior"),
        # Laplace floor for any feature never seen with this label
        _microlog(F.lit(1.0) / (F.col("tot") + F.lit(vocab))).alias("llr0"),
        F.col("tot"),
    )
    likelihood = feats.join(totals, "label").select(
        "label",
        "feat",
        _microlog(
            (F.col("cnt") + F.lit(1)) / (F.col("tot") + F.lit(vocab))
        ).alias("llr"),
    )
    return {"likelihood": likelihood, "labels": labels}


def nb_score(
    docs: DataFrame, model: dict[str, DataFrame], id_col: str, text_col: str
) -> DataFrame:
    """(id, label, score BIGINT) for every document × label, sparse-NB
    identity; the likelihood/label tables broadcast (Zipf-small), the
    corpus shuffles once on the document id for the score aggregate."""
    feats = (
        _features(docs.select(id_col, text_col), text_col)
        .groupBy(id_col, "feat")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    doc_len = feats.groupBy(id_col).agg(F.sum("n").alias("len"))
    seen = (
        feats.join(F.broadcast(model["likelihood"]), "feat")
        .groupBy(id_col, "label")
        .agg(
            F.sum(F.col("llr") * F.col("n")).alias("seen_sum"),
            F.sum("n").alias("seen_n"),
        )
    )
    grid = doc_len.crossJoin(
        F.broadcast(model["labels"].select("label", "prior", "llr0"))
    )
    return (
        grid.join(seen, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("prior")
                + F.coalesce(F.col("seen_sum"), F.lit(0))
                + (F.col("len") - F.coalesce(F.col("seen_n"), F.lit(0)))
                * F.col("llr0")
            ).alias("score"),
        )
    )


def nb_predict(
    scores: DataFrame, id_col: str
) -> DataFrame:
    """argmax label per document — ties break to the lexicographically
    smallest label (min over (−score, label), exact integer compare)."""
    return (
        scores.groupBy(id_col)
        .agg(
            F.min(F.struct((-F.col("score")).alias("ns"), "label")).alias(
                "__best"
            )
        )
        .select(
            id_col,
            F.col("__best.label").alias("predicted"),
            (-F.col("__best.ns")).alias("score"),
        )
    )
