"""The nightly data-quality report: every observability monitor behind
ONE contract.

Round 9 left the monitor family as seven verbs — per-segment row volume,
TVD distribution drift, KS drift, Mann-Whitney location drift,
cardinality drift, freshness SLA, Benford forensic audit — each with its
own query and threshold plumbing. This module is the r9 index-lifecycle
consolidation (functions/indexlife.py) applied to observability: the
kernels stay where they live (operators/drift.py for the epoch monitors;
the Benford and freshness kernels move HERE from their inline query
bodies), and this module owns the shared frame the VERDICT named —
pinned reference epoch, per-segment grouping, ppm-scaled metrics, one
``drifted`` flag schema — so a production pipeline registers ONE nightly
job and reads one matrix:

    (monitor, segment, metric, threshold, drifted)

- ``metric`` / ``threshold`` are BIGINT in each monitor's documented
  unit (ppm for the drift family, days/seconds for freshness) — every
  row stays engine-portable integer arithmetic;
- ``threshold`` is NULL where the bound is undefined (a segment empty on
  one side: maximal drift by definition);
- ``drifted`` is each kernel's own exact flag, never recomputed here.

Scale shape: the composed report is a UNION of the kernels' outputs —
each kernel is one or two map-side-combinable corpus aggregates; no
kernel gets more expensive by being composed, and the union rows are
answer-sized (segments × monitors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Benford's law first-digit shares in exact ppm literals (floor(log10(
# 1+1/d) * 1e6)) — precomputed so no log10/float-summation
# nondeterminism exists anywhere in the audit.
BENFORD_PPM = [
    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
    (6, 66947), (7, 57992), (8, 51153), (9, 45757),
]


def benford_report(
    df: DataFrame, amount_col: str, tol_ppm: int = 20_000
) -> DataFrame:
    """Benford first-digit audit over a positive numeric column — the
    forensic data-quality check for fabricated or truncated numeric
    feeds. Exact integer arithmetic end to end: first digits come from
    the money-cents string, observed shares compare against the
    :data:`BENFORD_PPM` literals via cross-multiplication
    (|cnt·1e6 − ppm·N| > tol·N), and the reported deviation leaves
    integer space only in its own final /N division. One
    map-side-combinable digit aggregate; everything after is 9 rows.

    Returns (digit, cnt, expected_ppm, observed_ppm, deviation_ppm,
    deviates)."""
    spark = df.sparkSession
    pos = df.filter(F.col(amount_col) > 0)
    cents = F.round(F.col(amount_col) * 100, 0).cast("bigint")
    digits = pos.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("cnt"))
    exp = spark.createDataFrame(BENFORD_PPM, "digit int, expected_ppm int")
    n = obs.agg(F.sum("cnt").alias("total"))
    dev2 = F.abs(  # |cnt·1e6 − ppm·N| — the exact cross-multiplied gap
        F.col("cnt") * F.lit(1_000_000).cast("long")
        - F.col("expected_ppm").cast("long") * F.col("total")
    )
    return (
        exp.join(F.broadcast(obs), "digit", "left")
        .na.fill({"cnt": 0})
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "cnt",
            "expected_ppm",
            F.floor(F.col("cnt") * 1_000_000 / F.col("total"))
            .cast("long")
            .alias("observed_ppm"),
            F.floor(dev2 / F.col("total")).cast("long").alias(
                "deviation_ppm"
            ),
            (dev2 > F.lit(int(tol_ppm)).cast("long") * F.col("total"))
            .alias("deviates"),
        )
    )


def freshness_report(
    df: DataFrame,
    ts_col: str,
    segment_col: str,
    sla_s: int = 86_400,
) -> DataFrame:
    """Per-segment freshness against the corpus watermark: each
    segment's last-event lag (seconds) vs the table-wide max timestamp,
    and a staleness flag at the SLA. One map-side-combinable aggregate
    (count + max per segment) and a 1-row broadcast reference; all
    arithmetic in exact epoch milliseconds.

    Returns (segment, n_events, lag_s, stale)."""
    per = df.filter(F.col(segment_col).isNotNull()).groupBy(
        F.col(segment_col).alias("segment")
    ).agg(
        F.count("*").alias("n_events"),
        F.max(F.unix_millis(F.col(ts_col))).alias("__last_ms"),
    )
    ref = per.agg(F.max("__last_ms").alias("__now_ms"))
    return per.crossJoin(F.broadcast(ref)).select(
        "segment",
        "n_events",
        F.floor((F.col("__now_ms") - F.col("__last_ms")) / 1000)
        .cast("long")
        .alias("lag_s"),
        ((F.col("__now_ms") - F.col("__last_ms")) > sla_s * 1000)
        .alias("stale"),
    )


def _freshness_days(
    df: DataFrame, date_col: str, segment_col: str, sla_days: int
) -> DataFrame:
    """Date-grained freshness for DATE-typed tables: per-segment lag in
    whole DAYS vs the corpus max date. Pure date arithmetic — no
    date→timestamp cast, whose epoch value is session-timezone-dependent
    and would diverge from the oracle under the driver's vanilla session.

    Returns (segment, lag_days, stale)."""
    per = df.filter(F.col(segment_col).isNotNull()).groupBy(
        F.col(segment_col).alias("segment")
    ).agg(F.max(F.col(date_col)).alias("__last"))
    ref = per.agg(F.max("__last").alias("__now"))
    return per.crossJoin(F.broadcast(ref)).select(
        "segment",
        F.datediff(F.col("__now"), F.col("__last"))
        .cast("long")
        .alias("lag_days"),
        (F.datediff(F.col("__now"), F.col("__last")) > sla_days)
        .alias("stale"),
    )


def _rows(
    df: DataFrame, monitor: str, segment: Column, metric: Column,
    threshold: Column, drifted: Column,
) -> DataFrame:
    """Adapt one kernel's report to the shared matrix row shape."""
    return df.select(
        F.lit(monitor).alias("monitor"),
        segment.cast("string").alias("segment"),
        metric.cast("long").alias("metric"),
        threshold.cast("long").alias("threshold"),
        drifted.cast("boolean").alias("drifted"),
    )


def quality_report(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    key_col: str,
    segment_col: str,
    tie_cols: list[str],
    date_col: str | None = None,
    n_buckets: int = 10,
    tvd_threshold_ppm: int = 50_000,
    volume_threshold_ppm: int = 200_000,
    cardinality_threshold_ppm: int = 200_000,
    mw_threshold_ppm: int = 100_000,
    benford_tol_ppm: int = 20_000,
    freshness_sla_days: int = 30,
) -> DataFrame:
    """The composed nightly quality matrix over one (reference epoch,
    current epoch) pair: every monitor verb as rows of the shared
    (monitor, segment, metric, threshold, drifted) frame.

    | monitor     | segment   | metric (unit)              | threshold |
    |-------------|-----------|----------------------------|-----------|
    | volume      | segment   | row-delta ppm vs ref       | ppm       |
    | cardinality | segment   | distinct-key delta ppm     | ppm       |
    | tvd         | ``(all)`` | bucketed TVD ppm           | ppm       |
    | ks          | segment   | sup-distance ppm           | crit ppm  |
    | mw          | segment   | \\|effect − 500000\\| ppm    | ppm       |
    | benford     | digit=d   | deviation ppm (CURRENT)    | ppm       |
    | freshness   | segment   | lag days (CURRENT)         | days      |

    The KS row's threshold is its own alpha=0.05 critical bound scaled
    to ppm (floor(1e6 · 1.358·sqrt((n_r+n_c)/(n_r·n_c))) — literal-
    coefficient IEEE arithmetic, deterministic both engines); NULL with
    ``drifted=true`` where a segment is empty on either side. Benford
    and freshness audit the CURRENT epoch only (the reference pins the
    comparison for the drift verbs; freshness/forensics are properties
    of the incoming batch). ``date_col=None`` omits the freshness rows.

    Each kernel keeps its own exact flag semantics — this composition
    never recomputes a verdict, it only reshapes columns — so the matrix
    stays value-exact wherever the standalone monitors are."""
    from pipelinewise_spark.caching import register_cache
    from pipelinewise_spark.operators.drift import (
        _two_sample_value_counts,
        cardinality_drift,
        distribution_drift,
        ks_drift_from_counts,
        mw_drift_from_counts,
        volume_drift,
    )

    vol = _rows(
        volume_drift(reference, current, segment_col, volume_threshold_ppm),
        "volume", F.col("segment"), F.col("delta_ppm"),
        F.lit(volume_threshold_ppm), F.col("drifted"),
    )
    card = _rows(
        cardinality_drift(
            reference, current, key_col, segment_col,
            cardinality_threshold_ppm,
        ),
        "cardinality", F.col("segment"), F.col("delta_ppm"),
        F.lit(cardinality_threshold_ppm), F.col("drifted"),
    )
    tvd = _rows(
        distribution_drift(
            reference, current, value_col, tie_cols, n_buckets,
            tvd_threshold_ppm,
        ).limit(1),  # tvd_ppm/drifted are table-wide on every bucket row
        "tvd", F.lit("(all)"), F.col("tvd_ppm"),
        F.lit(tvd_threshold_ppm), F.col("drifted"),
    )
    # the two rank monitors consume the SAME per-(segment, value) counts
    # — build (and pin) that shuffled aggregate once instead of
    # re-scanning both epochs per monitor; released by the host's
    # release_caches sweep like every operator-registered persist.
    # Deliberately NO coalesce before the persist: narrowing the cached
    # width to defaultParallelism looked attractive (a cached plan is
    # pinned — AQE can't re-coalesce below the cache boundary) but
    # measured FLAT at sf0.1 and, worse, 32 concurrent fat cache-build
    # tasks OOM a vanilla 1 GiB driver heap on local[32]; the
    # un-coalesced shuffle width is the safe shape in both worlds.
    pv = register_cache(
        _two_sample_value_counts(
            reference, current, value_col, segment_col
        ).persist()
    )
    ks = ks_drift_from_counts(pv)
    nr, nc = F.col("n_ref").cast("double"), F.col("n_cur").cast("double")
    empty = (F.col("n_ref") == 0) | (F.col("n_cur") == 0)
    ks_rows = _rows(
        ks, "ks", F.col("segment"), F.col("d_ppm"),
        F.when(
            ~empty,
            F.floor(
                1_000_000.0
                * 1.358
                * F.sqrt((nr + nc) / (nr * nc))
            ),
        ),
        F.col("significant"),
    )
    mw = mw_drift_from_counts(pv, mw_threshold_ppm)
    mw_rows = _rows(
        mw, "mw", F.col("segment"),
        F.abs(F.col("effect_ppm") - F.lit(500_000)),
        F.lit(mw_threshold_ppm), F.col("drifted"),
    )
    ben = _rows(
        benford_report(current, value_col, benford_tol_ppm),
        "benford", F.concat(F.lit("digit="), F.col("digit")),
        F.col("deviation_ppm"), F.lit(benford_tol_ppm), F.col("deviates"),
    )
    parts = [vol, card, tvd, ks_rows, mw_rows, ben]
    if date_col is not None:
        parts.append(
            _rows(
                _freshness_days(
                    current, date_col, segment_col, freshness_sla_days
                ),
                "freshness", F.col("segment"), F.col("lag_days"),
                F.lit(freshness_sla_days), F.col("stale"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
