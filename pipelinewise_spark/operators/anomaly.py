"""Ingest-volume anomaly detection over commit history.

The data-observability layer (Monte-Carlo/dbt-source-freshness class)
every production replication pipeline bolts on: did a commit load a
wildly different row volume than its peers? The reference records
per-batch load metadata (archive-load-files min/max key + row counts);
this operator turns any per-commit metric series — e.g.
``ManifestTable.meta(spark, "snapshots")`` row deltas — into robust
outlier flags using the median/MAD rule:

    anomaly(x)  ⇔  |x − median| > k·MAD + rel·median

The ``rel·median`` floor keeps the rule meaningful when the series is
perfectly regular (MAD = 0 — common for modulo-sharded backfills) —
otherwise ANY nonzero deviation would flag.

Scale note: commit histories are answer-sized by nature (one row per
snapshot), so the exact medians here run on a frame of #commits rows —
never on data. For per-PARTITION volume series at high cardinality,
feed the same rule through the distributed rank machinery
(operators/rank.py) instead of ``percentile``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def volume_anomalies(
    history: DataFrame,
    value_col: str,
    k: float = 3.0,
    rel: float = 0.01,
) -> DataFrame:
    """``history`` + (deviation, threshold, is_anomaly) columns."""
    med = history.agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    devs = history.crossJoin(F.broadcast(med)).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = devs.agg(F.expr("percentile(__dev, 0.5)").alias("mad"))
    return (
        devs.crossJoin(F.broadcast(mad))
        .withColumn(
            "threshold", F.lit(k) * F.col("mad") + F.lit(rel) * F.col("med")
        )
        .withColumn("is_anomaly", F.col("__dev") > F.col("threshold"))
        .drop("med", "mad", "__dev", "threshold")
    )


def snapshot_row_deltas(snapshots: DataFrame) -> DataFrame:
    """(version, rows_added) from a ``meta(spark, "snapshots")`` frame —
    the per-commit loaded-row series (first commit counts in full)."""
    from pyspark.sql import Window

    w = Window.orderBy("version")
    return snapshots.select(
        "version",
        (
            F.col("total_rows")
            - F.coalesce(F.lag("total_rows").over(w), F.lit(0))
        ).alias("rows_added"),
    )


def seasonal_anomalies(
    series: DataFrame,
    season_col: str,
    value_col: str,
    k: float = 3.0,
    rel: float = 0.01,
) -> DataFrame:
    """Season-aware median/MAD rule: the same robust outlier test as
    :func:`volume_anomalies`, but each row is judged against the baseline
    of ITS OWN season bucket (day-of-week, hour-of-day, …) — a Monday is
    compared to Mondays, so weekly shape doesn't read as seven anomalies.

    ``series`` is one row per (season, point) — e.g. daily event counts
    with ``season_col = dow``. Scale: the series is date-cardinality-
    bounded (never corpus-bounded: the heavy corpus aggregate producing it
    is map-side combinable), so the two per-season exact medians run on
    answer-sized groups; baselines broadcast back as a #seasons-row join.
    Emits ``baseline_median``, ``mad`` (rounded to 6 dp so the flag
    arithmetic is engine-portable) and ``is_anomaly``."""
    med = series.groupBy(season_col).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias(
            "baseline_median"
        )
    )
    devs = series.join(F.broadcast(med), season_col).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("baseline_median"))
    )
    mad = devs.groupBy(season_col).agg(
        F.round(F.expr("percentile(__dev, 0.5)"), 6).alias("mad")
    )
    return (
        devs.join(F.broadcast(mad), season_col)
        .withColumn(
            "is_anomaly",
            F.col("__dev")
            > F.lit(k) * F.col("mad") + F.lit(rel) * F.col("baseline_median"),
        )
        .drop("__dev")
    )
