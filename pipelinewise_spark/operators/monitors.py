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

from pipelinewise_spark.partitioning import local_frame
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Benford's law first-digit shares in exact ppm literals (floor(log10(
# 1+1/d) * 1e6)) — precomputed so no log10/float-summation
# nondeterminism exists anywhere in the audit.
BENFORD_PPM = [
    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
    (6, 66947), (7, 57992), (8, 51153), (9, 45757),
]


def _benford_digit_counts(df: DataFrame, amount_col: str) -> DataFrame:
    """(digit, cnt) — the Benford audit's sufficient statistic: first
    digits of the money-cents string over positive amounts, one
    map-side-combinable aggregate. Counts are associative, so per-batch
    folds of this frame equal the one-shot aggregate (the streaming
    monitor's stream ≡ batch basis)."""
    pos = df.filter(F.col(amount_col) > 0)
    cents = F.round(F.col(amount_col) * 100, 0).cast("bigint")
    digits = pos.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    return digits.groupBy("digit").agg(F.count("*").alias("cnt"))


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
    return _benford_score(
        df.sparkSession, _benford_digit_counts(df, amount_col), tol_ppm
    )


def _benford_score(
    spark, obs: DataFrame, tol_ppm: int
) -> DataFrame:
    """Score a (digit, cnt) frame against the Benford literals — shared
    by the batch report and the streaming monitor's folded counts."""
    exp = local_frame(spark, BENFORD_PPM, "digit int, expected_ppm int")
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
    return _freshness_days_from_last(per, sla_days)


def _freshness_days_from_last(per: DataFrame, sla_days: int) -> DataFrame:
    """Score a (segment, __last date) frame — shared by the batch report
    and the streaming monitor's folded per-segment max dates (max is
    associative, so per-batch folds equal the one-shot aggregate)."""
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


# ---------------------------------------------------------------------------
# The STREAMING face of the quality matrix: the monitor verbs whose
# sufficient statistic is O(segments)-mergeable run INSIDE the stream;
# the rank verbs (KS, Mann-Whitney) stay nightly-batch by necessity —
# their sufficient statistic is the per-(segment, value) count table,
# value-domain-scale state no bounded monitor should hold.
# ---------------------------------------------------------------------------


def _streamable_matrix(
    vol: DataFrame,
    card: DataFrame,
    tvd_seg: DataFrame,
    ben: DataFrame,
    fresh: DataFrame | None,
    volume_threshold_ppm: int,
    cardinality_threshold_ppm: int,
    tvd_threshold_ppm: int,
    benford_tol_ppm: int,
    freshness_sla_days: int,
) -> DataFrame:
    """Shape the five streamable kernels' reports into the shared
    (monitor, segment, metric, threshold, drifted) frame — ONE assembler
    used by both the batch twin and the streaming monitor, so stream ≡
    batch cannot drift apart in the row shaping."""
    parts = [
        _rows(
            vol, "volume", F.col("segment"), F.col("delta_ppm"),
            F.lit(volume_threshold_ppm), F.col("drifted"),
        ),
        _rows(
            card, "cardinality", F.col("segment"), F.col("delta_ppm"),
            F.lit(cardinality_threshold_ppm), F.col("drifted"),
        ),
        _rows(
            tvd_seg, "tvd", F.col("segment"), F.col("tvd_ppm"),
            F.lit(tvd_threshold_ppm), F.col("drifted"),
        ),
        _rows(
            ben, "benford", F.concat(F.lit("digit="), F.col("digit")),
            F.col("deviation_ppm"), F.lit(benford_tol_ppm),
            F.col("deviates"),
        ),
    ]
    if fresh is not None:
        parts.append(
            _rows(
                fresh, "freshness", F.col("segment"), F.col("lag_days"),
                F.lit(freshness_sla_days), F.col("stale"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quality_report_streamable(
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
    benford_tol_ppm: int = 20_000,
    freshness_sla_days: int = 30,
    lgk: int = 14,
) -> DataFrame:
    """The BATCH TWIN of :class:`StreamingQualityMonitor`: the five
    monitor verbs whose state is O(segments)-mergeable — per-segment
    volume, HLL cardinality (the 100 TB swap, not exact countDistinct,
    so the stream's mergeable-sketch fold computes the IDENTICAL
    estimate), per-segment TVD, Benford, freshness — as one matrix.
    After a stream whose rows are exactly ``current`` drains,
    ``StreamingQualityMonitor.report()`` equals this frame row-for-row:
    every fold is a sum/max/register-max of per-batch statistics and
    all three are associative; the row shaping is literally shared
    (:func:`_streamable_matrix`).

    KS and Mann-Whitney are deliberately ABSENT: their sufficient
    statistic is the per-(segment, value) count table — value-domain-
    scale, not O(segments) — so they stay in the nightly batch matrix
    (:func:`quality_report`)."""
    from pipelinewise_spark.operators.drift import (
        cardinality_drift_hll,
        distribution_drift_by_segment,
        volume_drift,
    )

    vol = volume_drift(
        reference, current, segment_col, volume_threshold_ppm
    )
    card = cardinality_drift_hll(
        reference, current, key_col, segment_col,
        cardinality_threshold_ppm, lgk=lgk,
    )
    tvd_seg = distribution_drift_by_segment(
        reference, current, value_col, tie_cols, segment_col,
        n_buckets, tvd_threshold_ppm,
    ).select("segment", "tvd_ppm", "drifted").distinct()
    ben = benford_report(current, value_col, benford_tol_ppm)
    fresh = (
        _freshness_days(current, date_col, segment_col, freshness_sla_days)
        if date_col is not None
        else None
    )
    return _streamable_matrix(
        vol, card, tvd_seg, ben, fresh,
        volume_threshold_ppm, cardinality_threshold_ppm,
        tvd_threshold_ppm, benford_tol_ppm, freshness_sla_days,
    )


class StreamingQualityMonitor:
    """The quality matrix maintained AT INGEST — the r10 segment-level
    drift monitor (operators/drift.py:SegmentedStreamingDriftMonitor)
    generalized to every monitor verb whose sufficient statistic is
    O(segments)-MERGEABLE, so ONE checkpointed streaming job emits the
    same (monitor, segment, metric, threshold, drifted) frame per epoch
    that the nightly batch job emits:

    - volume: per-segment row counts (sum-mergeable);
    - cardinality: per-segment DataSketches HLL registers
      (register-max-mergeable — the union of per-batch sketches has the
      IDENTICAL register state, hence the identical estimate, as one
      aggregate over all rows; Spark's hll_sketch_agg is itself a
      partial-merged union across partitions);
    - tvd: per-(segment, bucket) counts against reference-pinned
      per-segment decile bounds (sum-mergeable);
    - benford: first-digit counts of the CURRENT epoch (sum-mergeable);
    - freshness: per-segment max event date (max-mergeable).

    KS/Mann-Whitney stay nightly-batch: their sufficient statistic is
    the per-(segment, value) count table — value-domain-scale state no
    bounded monitor should hold (see :func:`quality_report`).

    State is METADATA-SCALE and constant in stream length: n_segments ×
    (n_buckets + 2 scalars + one KB-sized HLL register blob) + 9 digit
    counts + the epoch high-water mark — one JSON sidecar through the
    MetaFS seam (s3://-capable), written atomically per batch.
    At-least-once foreachBatch redelivery is a no-op under the same
    monotone-epoch guard as the drift monitors. Per batch: ONE
    map-side-combinable (segment, bucket, digit)-grouped aggregate over
    the batch — every monitor's fold falls out of its collected rows —
    plus one tiny sketch-union job over KB-sized register rows.

    Stream ≡ batch: after draining a stream whose rows are exactly
    ``current``, :meth:`report` equals
    :func:`quality_report_streamable` row-for-row (sums, maxes and
    register-maxes are associative; the matrix shaping is shared code).
    """

    def __init__(
        self,
        reference: DataFrame,
        value_col: str,
        key_col: str,
        segment_col: str,
        tie_cols: list[str],
        state_dir: str,
        date_col: str | None = None,
        n_buckets: int = 10,
        tvd_threshold_ppm: int = 50_000,
        volume_threshold_ppm: int = 200_000,
        cardinality_threshold_ppm: int = 200_000,
        benford_tol_ppm: int = 20_000,
        freshness_sla_days: int = 30,
        lgk: int = 14,
    ):
        import base64
        import json

        import pyarrow.fs as _pafs

        from pipelinewise_spark.operators.drift import (
            _segment_bounds_frame,
            derive_segment_bucket_bounds,
        )
        from pipelinewise_spark.operators.fsio import MetaFS

        self.value_col = value_col
        self.key_col = key_col
        self.segment_col = segment_col
        self.date_col = date_col
        self.mfs = MetaFS(state_dir)
        if isinstance(self.mfs.fs, _pafs.LocalFileSystem):
            self.mfs.mkdirs()
        if self.mfs.exists("_quality_state.json"):
            self.state = json.loads(
                self.mfs.read_text("_quality_state.json")
            )
            return
        bounds = derive_segment_bucket_bounds(
            reference, value_col, tie_cols, segment_col, n_buckets
        )
        # ONE fine-group reference pass pins ALL of the reference-side
        # state (r14, guide §2.3 — aggregate before you scan twice):
        # the same (segment, bucket) fine groups the per-batch fold uses
        # yield the tvd bucket counts directly, the per-segment volumes
        # as bucket-group sums, and the HLL registers as a per-segment
        # union of the fine-group sketches — register-max is
        # associative, the exact mergeability this monitor's stream ≡
        # batch contract already rests on. Replaces the former separate
        # bucket-count and volume+HLL corpus passes; the union job runs
        # over ≤ segments × (buckets+1) KB-sized rows.
        bf = _segment_bounds_frame(reference.sparkSession, bounds)
        v = F.col(value_col)
        bucket = F.when(
            F.col("es").isNotNull() & F.col("__v").isNotNull(),
            F.size(F.filter("es", lambda e: F.col("__v") > e)) + 1,
        ).cast("int")
        fine = (
            reference.filter(F.col(segment_col).isNotNull())
            .select(
                F.col(segment_col).cast("string").alias("segment"),
                v.alias("__v"),
                F.col(key_col).alias("__k"),
            )
            .join(F.broadcast(bf), "segment", "left")
            .withColumn("__bucket", bucket)
            .groupBy("segment", "__bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.hll_sketch_agg(F.col("__k"), F.lit(lgk)).alias("s"),
            )
        )
        fine_rows = fine.collect()
        tvd_ref = {
            seg: {str(b): 0 for b in range(1, n_buckets + 1)}
            for seg in bounds
        }
        vol_ref: dict[str, int] = {}
        sketch_rows = []
        for r in fine_rows:
            seg = r["segment"]
            vol_ref[seg] = vol_ref.get(seg, 0) + int(r["n"])
            if r["__bucket"] is not None:
                tvd_ref[seg][str(int(r["__bucket"]))] = int(r["n"])
            if r["s"] is not None:
                sketch_rows.append((seg, bytes(r["s"])))
        scal_hll: dict[str, bytes] = {}
        if sketch_rows:
            from pipelinewise_spark.partitioning import local_frame

            scal_hll = {
                r["segment"]: bytes(r["u"])
                for r in local_frame(
                    reference.sparkSession,
                    sketch_rows,
                    "segment string, s binary",
                )
                .groupBy("segment")
                .agg(F.hll_union_agg("s").alias("u"))
                .collect()
            }
        self.state = {
            "params": {
                "n_buckets": n_buckets, "lgk": lgk,
                "tvd_threshold_ppm": tvd_threshold_ppm,
                "volume_threshold_ppm": volume_threshold_ppm,
                "cardinality_threshold_ppm": cardinality_threshold_ppm,
                "benford_tol_ppm": benford_tol_ppm,
                "freshness_sla_days": freshness_sla_days,
            },
            "bounds": bounds,
            "tvd_ref": tvd_ref,
            "tvd_cur": {
                seg: {str(b): 0 for b in range(1, n_buckets + 1)}
                for seg in bounds
            },
            "vol_ref": vol_ref,
            "vol_cur": {},
            "hll_ref": {
                seg: base64.b64encode(blob).decode()
                for seg, blob in scal_hll.items()
            },
            "hll_cur": {},
            "ben_cur": {},
            "fresh_cur": {},
            "epoch_hwm": None,
            "n_applied": 0,
        }
        self._save()

    def _save(self) -> None:
        import json

        self.mfs.write_text(
            json.dumps(self.state), "_quality_state.json", atomic=True
        )

    def on_batch(self, batch: DataFrame, epoch: int) -> None:
        """Fold one micro-batch into every monitor's state — ONE
        map-side-combinable corpus aggregate per batch: rows group by
        (segment, bucket, first-digit), so volume (Σn per segment), tvd
        (n per segment-bucket), benford (Σn per digit), freshness
        (max date per segment) and the HLL registers (per-fine-group
        sketches, unioned per segment in the KB-sized merge job that
        also folds the stored registers) all fall out of the same
        ≤ segments × (buckets+1) × 10 collected rows. Idempotent per
        epoch (at-least-once transport safe)."""
        import base64

        from pipelinewise_spark.operators.drift import (
            _segment_bounds_frame,
        )

        hwm = self.state.get("epoch_hwm")
        if hwm is not None and epoch <= hwm:
            return
        spark = batch.sparkSession
        p = self.state["params"]
        bf = _segment_bounds_frame(spark, self.state["bounds"])
        v = F.col(self.value_col)
        # digit derivation identical to _benford_digit_counts
        digit = F.when(
            v > 0,
            F.substring(
                F.round(v * 100, 0).cast("bigint").cast("string"), 1, 1
            ).cast("int"),
        )
        sel = [
            F.col(self.segment_col).cast("string").alias("segment"),
            v.alias("__v"),
            F.col(self.key_col).alias("__k"),
            digit.alias("__digit"),
        ]
        if self.date_col is not None:
            sel.append(F.col(self.date_col).alias("__d"))
        # NULL-segment rows stay in the frame: Benford is a CORPUS
        # monitor (the batch twin scores the unfiltered current epoch),
        # so their digits must count; the segment-scoped verbs (volume,
        # tvd, cardinality, freshness) skip them in the fold below —
        # exactly the batch twin's per-verb isNotNull filters.
        b = batch.select(*sel).join(F.broadcast(bf), "segment", "left")
        bucket = F.when(
            F.col("es").isNotNull() & F.col("__v").isNotNull(),
            F.size(F.filter("es", lambda e: F.col("__v") > e)) + 1,
        ).cast("int")
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.hll_sketch_agg(F.col("__k"), F.lit(p["lgk"])).alias("s"),
        ]
        if self.date_col is not None:
            aggs.append(F.max("__d").alias("last"))
        rows = (
            b.withColumn("__bucket", bucket)
            .groupBy("segment", "__bucket", "__digit")
            .agg(*aggs)
            .collect()
        )  # ≤ segments × (buckets+1) × 10 rows — metadata
        merge_rows = [
            (seg, base64.b64decode(blob))
            for seg, blob in self.state["hll_cur"].items()
        ]
        for r in rows:
            seg = r["segment"]
            n = int(r["n"])
            # Benford first: corpus-scoped, counts NULL-segment rows
            # too (matches the batch twin's unfiltered benford_report)
            if r["__digit"] is not None:
                d = str(int(r["__digit"]))
                self.state["ben_cur"][d] = (
                    self.state["ben_cur"].get(d, 0) + n
                )
            if seg is None:
                continue  # segment-scoped verbs exclude NULL segments
            self.state["vol_cur"][seg] = (
                self.state["vol_cur"].get(seg, 0) + n
            )
            if r["__bucket"] is not None:
                cur = self.state["tvd_cur"][seg]
                bk = str(int(r["__bucket"]))
                cur[bk] = cur.get(bk, 0) + n
            if self.date_col is not None and r["last"] is not None:
                prev = self.state["fresh_cur"].get(seg)
                iso = r["last"].isoformat()
                if prev is None or iso > prev:
                    self.state["fresh_cur"][seg] = iso
            if r["s"] is not None:
                merge_rows.append((seg, bytes(r["s"])))
        # register union: stored ⊔ this batch's fine-group sketches —
        # one tiny job over KB-sized rows (register-max is associative,
        # so per-group sketches union to the same state as one
        # segment-level aggregate)
        if merge_rows:
            merged = (
                local_frame(spark, 
                    merge_rows, "segment string, s binary"
                )
                .groupBy("segment")
                .agg(F.hll_union_agg("s").alias("u"))
                .collect()
            )
            self.state["hll_cur"] = {
                r["segment"]: base64.b64encode(bytes(r["u"])).decode()
                for r in merged
            }
        self.state["epoch_hwm"] = (
            epoch if hwm is None else max(hwm, epoch)
        )
        self.state["n_applied"] = self.state.get("n_applied", 0) + 1
        self._save()

    def report(self, spark) -> DataFrame:
        """The same matrix :func:`quality_report_streamable` emits, from
        the folded state — every kernel re-scored through the SAME code
        (segment_scalar_drift, _score_tvd_by_segment, _benford_score,
        _freshness_days_from_last, _streamable_matrix)."""
        import base64
        import datetime

        from pipelinewise_spark.operators.drift import (
            _score_tvd_by_segment,
            _segment_bucket_frame,
            segment_scalar_drift,
        )

        p = self.state["params"]
        st = self.state

        def counts_frame(d: dict, out: str) -> DataFrame:
            return local_frame(spark, 
                [(seg, int(n)) for seg, n in sorted(d.items())]
                or [(None, 0)],
                f"segment string, {out} long",
            ).filter(F.col("segment").isNotNull())

        vol = segment_scalar_drift(
            counts_frame(st["vol_ref"], "ref_rows"),
            counts_frame(st["vol_cur"], "cur_rows"),
            "ref_rows", "cur_rows", p["volume_threshold_ppm"],
        )

        def est_frame(d: dict, out: str) -> DataFrame:
            rows = [
                (seg, base64.b64decode(b)) for seg, b in sorted(d.items())
            ]
            if not rows:
                return local_frame(spark, 
                    [], f"segment string, {out} long"
                )
            return local_frame(spark, 
                rows, "segment string, s binary"
            ).select(
                "segment",
                F.hll_sketch_estimate("s").cast("bigint").alias(out),
            )

        card = segment_scalar_drift(
            est_frame(st["hll_ref"], "ref_distinct"),
            est_frame(st["hll_cur"], "cur_distinct"),
            "ref_distinct", "cur_distinct",
            p["cardinality_threshold_ppm"],
        )
        per = _segment_bucket_frame(
            spark, st["bounds"], p["n_buckets"]
        ).join(
            local_frame(spark, 
                [
                    (
                        seg,
                        b,
                        int(st["tvd_ref"][seg].get(str(b), 0)),
                        int(st["tvd_cur"][seg].get(str(b), 0)),
                    )
                    for seg in sorted(st["bounds"])
                    for b in range(1, p["n_buckets"] + 1)
                ],
                "segment string, bucket int, ref_cnt long, cur_cnt long",
            ),
            ["segment", "bucket"],
        )
        tvd_seg = _score_tvd_by_segment(
            per, p["tvd_threshold_ppm"]
        ).select("segment", "tvd_ppm", "drifted").distinct()
        ben = _benford_score(
            spark,
            local_frame(spark, 
                [(int(d), int(c)) for d, c in sorted(st["ben_cur"].items())]
                or [(None, 0)],
                "digit int, cnt long",
            ).filter(F.col("digit").isNotNull()),
            p["benford_tol_ppm"],
        )
        fresh = None
        if self.date_col is not None:
            fresh = _freshness_days_from_last(
                local_frame(spark, 
                    [
                        (seg, datetime.date.fromisoformat(d))
                        for seg, d in sorted(st["fresh_cur"].items())
                    ]
                    or [(None, None)],
                    "segment string, __last date",
                ).filter(F.col("segment").isNotNull()),
                p["freshness_sla_days"],
            )
        return _streamable_matrix(
            vol, card, tvd_seg, ben, fresh,
            p["volume_threshold_ppm"], p["cardinality_threshold_ppm"],
            p["tvd_threshold_ppm"], p["benford_tol_ppm"],
            p["freshness_sla_days"],
        )
