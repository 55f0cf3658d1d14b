"""Corpus data card: the publishable one-frame datasheet for a document
corpus ("Datasheets for Datasets", Gebru et al. 2021 — the summary a
training-data release ships with).

Composes kernels the engine already trusts — whitespace tokenization
(functions/text.py:tokens), the canonical exact-dedup fingerprint
(functions/text.py:fingerprint), the no-single-reducer exact quantiles
(operators/rank.py:exact_quantiles) — into one tall (section, metric,
value) frame: corpus scalars, token-count quantiles, categorical mix
shares in integer ppm, and the exact-duplicate rate in ppm.

Every value is integer-exact (counts, ppm floors, discrete quantiles of
integer token counts), so the card hash-compares across engines.

Scale shape: three column-pruned, map-side-combinable passes total —
scalars + distinct-fingerprint count share one, ALL mix columns share
one (rows melt into (section, category) pairs so k mix columns never
means k scans; the ppm denominator comes from the melted aggregate
itself via a per-section window over the answer-sized frame, not a
separate count scan), and the quantiles ride the distributed rank.
Nothing is row-scale in the answer — the card is sections ×
cardinality rows. At
100 TB you'd persist the (id, n_tokens, fingerprint, mix…) projection
once and feed all three from it; at bench scale the re-scan is cheaper
than the cache churn.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinewise_spark.functions.text import fingerprint, token_count
from pipelinewise_spark.operators.rank import exact_quantiles
from pipelinewise_spark.partitioning import spread

_SCHEMA = "section string, metric string, value double"


def data_card(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mix_cols: Sequence[str] = (),
    quantiles: Sequence[float] = (0.1, 0.5, 0.9),
) -> DataFrame:
    """Build the (section, metric, value) data card for ``df``.

    Sections: ``corpus`` (docs, total_tokens, total_chars), ``dedup``
    (exact_dup_ppm — share of docs whose canonical fingerprint is not
    the class survivor), ``token_quantiles`` (pNN discrete quantiles of
    the whitespace token count, doc-id tie-broken), and one
    ``<col>_mix_ppm`` section per ``mix_cols`` entry (per-value doc
    share in ppm; metric = the category value, nulls as ``<null>``).
    """
    base = spread(df).select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        *[F.col(c) for c in mix_cols],
    )
    toked = base.withColumn("__ntok", token_count(F.col("__text")))

    scal = toked.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__ntok").cast("long").alias("__tok"),
        F.sum(F.length("__text")).cast("long").alias("__chars"),
        F.countDistinct(fingerprint(F.col("__text"))).alias("__fps"),
    )
    zero = F.lit(0).cast("long")
    scalars = scal.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("corpus").alias("section"),
                    F.lit("docs").alias("metric"),
                    F.col("__n").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("corpus").alias("section"),
                    F.lit("total_tokens").alias("metric"),
                    F.coalesce(F.col("__tok"), zero)
                    .cast("double")
                    .alias("value"),
                ),
                F.struct(
                    F.lit("corpus").alias("section"),
                    F.lit("total_chars").alias("metric"),
                    F.coalesce(F.col("__chars"), zero)
                    .cast("double")
                    .alias("value"),
                ),
                F.struct(
                    F.lit("dedup").alias("section"),
                    F.lit("exact_dup_ppm").alias("metric"),
                    F.when(
                        F.col("__n") > 0,
                        F.floor(
                            F.lit(1000000)
                            * (F.col("__n") - F.col("__fps"))
                            / F.col("__n")
                        ),
                    )
                    .otherwise(0)
                    .cast("double")
                    .alias("value"),
                ),
            )
        ).alias("row")
    ).select("row.*")

    qdf = exact_quantiles(toked, "__ntok", ["__id"], list(quantiles)).select(
        F.lit("token_quantiles").alias("section"),
        F.concat(
            F.lit("p"), F.floor(F.col("quantile") * 100).cast("string")
        ).alias("metric"),
        F.col("value").cast("double").alias("value"),
    )

    parts = [scalars, qdf]
    if mix_cols:
        # ALL mix columns in ONE corpus pass: melt each row into
        # (section, category) pairs, then one map-side-combinable
        # aggregate — k mix columns never means k scans. The ppm
        # denominator is derived FROM the melted aggregate itself
        # (every doc contributes exactly one category per section,
        # nulls included, so each section's counts sum to the doc
        # total) via a window over the answer-sized frame — no extra
        # count scan, no scalar crossJoin.
        melted = toked.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f"{c}_mix_ppm").alias("section"),
                            F.coalesce(
                                F.col(c).cast("string"), F.lit("<null>")
                            ).alias("metric"),
                        )
                        for c in mix_cols
                    ]
                )
            ).alias("kv")
        )
        from pyspark.sql import Window

        sect = Window.partitionBy("section")
        parts.append(
            melted.groupBy("kv.section", "kv.metric")
            .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
            .withColumn("__n", F.sum("__cnt").over(sect))
            .select(
                "section",
                "metric",
                F.floor(F.lit(1000000) * F.col("__cnt") / F.col("__n"))
                .cast("double")
                .alias("value"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
