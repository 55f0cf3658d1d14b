"""N-gram language-model scoring — the perplexity-style quality signal
LLM curation pipelines use (CCNet trains a 5-gram KenLM on Wikipedia and
filters CommonCrawl by perplexity band; the same mechanics at unigram order
are exactly expressible in DataFrame ops + a SQL oracle).

Reference behavior modeled: quality scoring over the documents table
(reference has no analogue — this extends the curation family of
functions/curation.py, functions/text.py).

Scale shape: the trained LM is the corpus vocabulary with add-k smoothed
probabilities — Zipf-small, broadcast to both the scoring join and the
normalizer. Cost is one token explode (one shuffle to build the vocab, one
to re-aggregate per doc); the corpus is scanned once per phase, never
collected. At 100 TB: train on a sampled/reference corpus once, persist
the vocab table, and the scoring pass is a broadcast join + groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinewise_spark.functions import text as TX


def train_unigram_lm(
    corpus: DataFrame, text_col: str = "text", add_k: float = 1.0
) -> DataFrame:
    """Add-k smoothed unigram LM from a corpus: (token, log_p). The
    normalizer (total tokens N, vocab size V) rides in via a broadcast
    1-row aggregate — no driver-side collect."""
    toks = corpus.select(
        F.explode(TX.tokens(F.col(text_col))).alias("token")
    )
    vocab = toks.groupBy("token").agg(
        F.count("*").cast("double").alias("__c")
    )
    stats = vocab.agg(
        F.sum("__c").alias("__n"), F.count("*").cast("double").alias("__v")
    )
    return vocab.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log(
            (F.col("__c") + F.lit(add_k))
            / (F.col("__n") + F.lit(add_k) * F.col("__v"))
        ).alias("log_p"),
    )


def unigram_cross_entropy(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document cross-entropy under the LM: H(doc) = -mean log p(tok).
    Low H = fluent under the training distribution; high H = noise /
    boilerplate / other-language — the filter band CCNet cuts on.

    Tokens absent from the LM (scoring a NEW corpus against a trained one)
    are dropped from the mean (inner join) — the smoothed-unseen variant
    would need the LM's normalizer constants carried along.

    Output is rounded to ``round_digits`` so the value is reproducible
    across evaluation orders (float addition is not associative; same
    convention as the repo's decimal-rounded aggregate oracles)."""
    toks = df.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("token")
    )
    return (
        toks.join(F.broadcast(lm), "token")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.avg("log_p"), round_digits)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("cross_entropy"),
        )
    )


def ccnet_perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet-style perplexity banding: score every document's
    cross-entropy under the corpus LM, then split EACH LANGUAGE into
    head / middle / tail at the per-language ``cuts`` interpolated
    percentiles (low perplexity = head = closest to the training
    distribution — the band CCNet keeps).

    Determinism contract: cross-entropy is 6-dp rounded (so identical in
    any engine), the per-language bounds come from the distributed
    PERCENTILE_CONT machinery (operators/rank.py) rounded the same way,
    and the band comparison is ``<=`` on those identical doubles — no
    last-ulp flip is possible on either side.

    Scale shape: one token explode to train (Zipf-small vocab broadcast
    back), one to score, ONE global range-partitioned rank for all
    language bounds (never a per-language sort task), bounds broadcast as
    |langs|×2 rows. Corpus scanned twice, never collected.
    """
    from pipelinewise_spark.operators.rank import (
        exact_group_quantiles_interpolated,
    )

    lm = train_unigram_lm(df, text_col)
    ce = unigram_cross_entropy(df, lm, id_col, text_col)
    scored = df.select(id_col, lang_col).join(ce, id_col)
    bounds = exact_group_quantiles_interpolated(
        scored, [lang_col], "cross_entropy", [id_col], list(cuts)
    )
    b = bounds.groupBy(lang_col).agg(
        F.min(
            F.when(F.col("quantile") == float(cuts[0]), F.col("value"))
        ).alias("__b_head"),
        F.min(
            F.when(F.col("quantile") == float(cuts[1]), F.col("value"))
        ).alias("__b_mid"),
    )
    band = (
        F.when(F.col("cross_entropy") <= F.col("__b_head"), F.lit("head"))
        .when(F.col("cross_entropy") <= F.col("__b_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(b), lang_col).select(
        id_col, lang_col, "n_tokens", "cross_entropy",
        band.alias("ppl_bucket"),
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    add_k: float = 1.0,
) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    importance log-weights from hashed unigram features: each token maps
    to one of ``num_buckets`` md5 buckets; bucket distributions are
    estimated (add-k smoothed) on the ``target`` corpus and on ``df``
    (the raw/source corpus); a document's log-weight is
    Σ_tokens ln(p_target(bucket)/p_source(bucket)) — high weight = looks
    like the target domain. 6-dp rounded for engine portability.

    Scale shape: the feature table is exactly ``num_buckets`` rows —
    both distributions aggregate map-side and broadcast back onto one
    corpus token explode. One wide scan for source counts + one for
    target + one to score; no driver collect; resampling on the weight
    composes with the md5 samplers in functions/curation.py.
    """
    def bucketed(frame: DataFrame) -> DataFrame:
        toks = frame.select(
            F.col(id_col),
            F.explode(TX.tokens(F.col(text_col))).alias("__tok"),
        )
        return toks.select(
            id_col,
            (
                F.conv(F.substring(F.md5("__tok"), 1, 8), 16, 10)
                .cast("long") % num_buckets
            ).alias("__fb"),
        )

    src = bucketed(df)
    tgt_counts = (
        bucketed(target).groupBy("__fb")
        .agg(F.count("*").cast("double").alias("__ct"))
    )
    src_counts = src.groupBy("__fb").agg(
        F.count("*").cast("double").alias("__cs")
    )
    # full-outer on the bucket id: a bucket can be empty on either side
    # (smoothing keeps both densities finite); totals ride in broadcast
    feats = (
        src_counts.join(tgt_counts, "__fb", "full_outer")
        .na.fill({"__cs": 0.0, "__ct": 0.0})
    )
    totals = feats.agg(
        F.sum("__cs").alias("__ns"), F.sum("__ct").alias("__nt")
    )
    k = F.lit(float(add_k))
    b = F.lit(float(num_buckets))
    ratios = feats.crossJoin(F.broadcast(totals)).select(
        "__fb",
        (
            F.log((F.col("__ct") + k) / (F.col("__nt") + k * b))
            - F.log((F.col("__cs") + k) / (F.col("__ns") + k * b))
        ).alias("__lr"),
    )
    return (
        src.join(F.broadcast(ratios), "__fb")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("__lr"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("log_weight"),
        )
    )


def _bigram_strings(toks: str) -> F.Column:
    """array<string> column expr -> array of "w1 w2" bigram strings.
    Guarded: sequence(1,0) would count DOWN, so <2-token arrays map to []."""
    return F.when(
        F.expr(f"size({toks})") > 1,
        F.expr(
            f"transform(sequence(1, size({toks}) - 1), "
            f"i -> concat(element_at({toks}, i), ' ', "
            f"element_at({toks}, i + 1)))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text", add_k: float = 1.0
) -> DataFrame:
    """Add-k smoothed bigram LM: ("w1 w2", log_p) with
    p(w2|w1) = (c(w1 w2) + k) / (c1(w1) + k·V), where c1 is w1's CONTEXT
    count (bigrams starting with w1) and V the unigram vocabulary size.
    Both count tables are Zipf-small; V rides in as a broadcast 1-row
    aggregate."""
    base = corpus.select(TX.tokens(F.col(text_col)).alias("__t"))
    bi = base.select(
        F.explode(_bigram_strings("__t")).alias("bigram")
    )
    c2 = bi.groupBy("bigram").agg(F.count("*").cast("double").alias("__c2"))
    c1 = c2.withColumn(
        "__w1", F.split(F.col("bigram"), " ").getItem(0)
    ).groupBy("__w1").agg(F.sum("__c2").alias("__c1"))
    vocab = (
        base.select(F.explode("__t").alias("__tok"))
        .agg(F.countDistinct("__tok").cast("double").alias("__v"))
    )
    return (
        c2.withColumn("__w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(c1, "__w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.log(
                (F.col("__c2") + F.lit(add_k))
                / (F.col("__c1") + F.lit(add_k) * F.col("__v"))
            ).alias("log_p"),
        )
    )


def bigram_cross_entropy(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document order-2 cross-entropy: -mean log p(w2|w1). Documents
    with fewer than two tokens produce no bigrams and drop out (same
    contract on the SQL-oracle side). Unknown bigrams drop from the mean
    (inner join), as in unigram_cross_entropy."""
    bigs = df.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__lm_toks")
    ).select(
        F.col(id_col), F.explode(_bigram_strings("__lm_toks")).alias("bigram")
    )
    return (
        bigs.join(F.broadcast(lm), "bigram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg("log_p"), round_digits)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("cross_entropy2"),
        )
    )
