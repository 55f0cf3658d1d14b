"""Snapshot drift detection — column-level statistical deltas between two
table versions, the data-quality gate a production pipeline runs after
every load ("did this batch silently shift the distribution?").

One aggregation pass per snapshot (partial-aggregated, no shuffle beyond
the single agg), producing a per-column stats row; the diff is a tiny
driver-side-width join. Sums are decimal-exact so the drift numbers are
engine-portable (the DuckDB oracle reproduces them bit-for-bit after
rounding). Flags are explicit predicates, not heuristics: null-rate delta
and relative mean shift against caller thresholds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pipelinewise_spark.partitioning import local_frame
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form per-column stats: (column, n_rows, n_nulls, mean, min,
    max). One aggregation; the long form comes from a literal explode of
    the per-column structs, so adding columns never changes the plan
    shape."""
    aggs = []
    for c in cols:
        v = F.col(c).cast("decimal(28,6)")
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    "n_nulls"
                ),
                F.sum(v).alias("sum"),
                F.min(F.col(c).cast("double")).alias("min"),
                F.max(F.col(c).cast("double")).alias("max"),
            ).alias(c)
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias("s")
    )
    return stacked.select(
        F.col("s.column").alias("column"),
        F.col("s.n_rows").alias("n_rows"),
        F.col("s.n_nulls").alias("n_nulls"),
        (F.col("s.sum") / (F.col("s.n_rows") - F.col("s.n_nulls"))).alias(
            "mean"
        ),
        F.col("s.min").alias("min"),
        F.col("s.max").alias("max"),
    )


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    cols: Sequence[str],
    mean_shift_threshold: float = 0.01,
    null_rate_threshold: float = 0.01,
) -> DataFrame:
    """Per-column drift report between two snapshots: old/new mean, the
    relative mean shift, old/new null rates, and a ``drifted`` flag when
    either the relative mean shift or the null-rate delta exceeds its
    threshold."""
    o = column_stats(old, cols).select(
        "column",
        F.col("mean").alias("old_mean"),
        (F.col("n_nulls") / F.col("n_rows")).alias("old_null_rate"),
    )
    n = column_stats(new, cols).select(
        "column",
        F.col("mean").alias("new_mean"),
        (F.col("n_nulls") / F.col("n_rows")).alias("new_null_rate"),
    )
    j = o.join(n, "column")
    rel_shift = F.abs(F.col("new_mean") - F.col("old_mean")) / F.abs(
        F.col("old_mean")
    )
    null_delta = F.abs(F.col("new_null_rate") - F.col("old_null_rate"))
    return j.select(
        "column",
        F.round(F.col("old_mean"), 6).cast("double").alias("old_mean"),
        F.round(F.col("new_mean"), 6).cast("double").alias("new_mean"),
        F.round(rel_shift, 6).cast("double").alias("mean_shift"),
        F.round(F.col("old_null_rate"), 6).cast("double").alias("old_null_rate"),
        F.round(F.col("new_null_rate"), 6).cast("double").alias("new_null_rate"),
        (
            (rel_shift > mean_shift_threshold)
            | (null_delta > null_rate_threshold)
        ).alias("drifted"),
    )


def derive_bucket_bounds(
    reference: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    n_buckets: int,
) -> list[float]:
    """n_buckets-tile bucket edges from the REFERENCE's distributed
    interpolated quantiles (rounded 6 dp — engine-portable). The edges
    are metadata (n_buckets − 1 floats) and pin the binning for every
    later comparison against this reference epoch."""
    from pipelinewise_spark.operators.rank import (
        exact_quantiles_interpolated,
    )

    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        r["value"]
        for r in exact_quantiles_interpolated(
            reference, value_col, list(tie_cols), qs
        ).collect()
    )
    if len(bounds) < n_buckets - 1:
        raise ValueError(
            "distribution drift: reference has no rows to derive "
            f"{n_buckets}-tile bounds from"
        )
    return [float(b) for b in bounds]


def _bucket_col(bounds: Sequence[float], n_buckets: int,
                col: Column) -> Column:
    b = F.lit(n_buckets)
    for i, edge in reversed(list(enumerate(bounds))):
        b = F.when(col <= F.lit(edge), F.lit(i + 1)).otherwise(b)
    return b.cast("int")


def _bucket_counts(
    df: DataFrame, bounds: Sequence[float], n_buckets: int,
    value_col: str, out: str,
) -> DataFrame:
    # NULL values are excluded, matching the quantile machinery that
    # derived the bounds (engines disagree on where a NULL "buckets":
    # three-valued <= sends it to the top bucket in Spark and out of
    # the filter entirely in SQL twins — excluding is the one portable
    # semantic, and it keeps p/q proportions meaningful)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(_bucket_col(bounds, n_buckets, F.col(value_col))
                .alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias(out))
    )


def _bucket_frame(spark, bounds: Sequence[float],
                  n_buckets: int) -> DataFrame:
    return local_frame(spark, 
        [
            (
                i + 1,
                float(bounds[i - 1]) if i > 0 else None,
                float(bounds[i]) if i < n_buckets - 1 else None,
            )
            for i in range(n_buckets)
        ],
        "bucket int, lo double, hi double",
    )


def distribution_drift(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    n_buckets: int = 10,
    tvd_threshold_ppm: int = 50_000,
) -> DataFrame:
    """Histogram-based distribution drift (the PSI-family feature-monitor
    check): bucket BOTH snapshots by the REFERENCE's ``n_buckets``-tile
    bounds, then score the shift with total-variation distance
    ``TVD = 1/2 * Σ |p_i − q_i|``.

    Engine-portable by construction: bucket bounds come from the
    distributed interpolated quantiles (operators/rank.py, rounded 6 dp),
    bucket assignment is pure comparison, and the TVD leaves integer space
    only in the LAST division — ``Σ |ref_cnt·N_cur − cur_cnt·N_ref|`` is
    exact BIGINT arithmetic, so no float-summation-order nondeterminism
    exists anywhere (PSI's ``ln`` is 1-ulp engine-dependent; TVD isn't).
    Scale: two corpus aggregation passes (quantile rank + bucket counts,
    both shuffle-light), then everything runs on n_buckets rows.

    Returns one row per bucket: (bucket, lo, hi, ref_cnt, cur_cnt) plus
    the table-wide tvd_ppm (parts-per-million, BIGINT) and drifted flag.
    """
    bounds = derive_bucket_bounds(reference, value_col, tie_cols, n_buckets)

    spark = reference.sparkSession
    per = (
        _bucket_frame(spark, bounds, n_buckets)
        .join(
            F.broadcast(
                _bucket_counts(reference, bounds, n_buckets, value_col,
                               "ref_cnt")
            ),
            "bucket", "left",
        )
        .join(
            F.broadcast(
                _bucket_counts(current, bounds, n_buckets, value_col,
                               "cur_cnt")
            ),
            "bucket", "left",
        )
        .na.fill({"ref_cnt": 0, "cur_cnt": 0})
    )
    return _score_tvd(per, tvd_threshold_ppm)


def _score_tvd(per: DataFrame, tvd_threshold_ppm: int) -> DataFrame:
    """(bucket, lo, hi, ref_cnt, cur_cnt) → the drift report with the
    table-wide integer-exact TVD (ppm) and the drifted flag."""
    tot = per.agg(
        F.sum("ref_cnt").alias("__nr"), F.sum("cur_cnt").alias("__nc")
    )
    # TVD in exact integer space: Σ|ref·Nc − cur·Nr| / (2·Nr·Nc), scaled to
    # ppm with one integer division at the very end
    scored = per.crossJoin(F.broadcast(tot)).withColumn(
        "__absdiff",
        F.abs(
            F.col("ref_cnt").cast("decimal(38,0)") * F.col("__nc")
            - F.col("cur_cnt").cast("decimal(38,0)") * F.col("__nr")
        ),
    )
    tvd = scored.agg(
        # an EMPTY current snapshot (total outage — the most extreme
        # drift) would make this division NULL and the flag silently
        # un-checkable; define it as max TVD instead
        F.when(F.max("__nc") == 0, F.lit(1_000_000))
        .otherwise(
            F.floor(
                (F.lit(1_000_000).cast("decimal(38,0)") * F.sum("__absdiff"))
                / (
                    F.lit(2).cast("decimal(38,0)")
                    * F.max("__nr")
                    * F.max("__nc")
                )
            )
        )
        .cast("long")
        .alias("tvd_ppm")
    )
    return (
        per.crossJoin(F.broadcast(tvd))
        .withColumn("drifted", F.col("tvd_ppm") > F.lit(tvd_threshold_ppm))
        .select(
            "bucket", "lo", "hi", "ref_cnt", "cur_cnt", "tvd_ppm", "drifted"
        )
    )


def _two_sample_value_counts(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    segment_col: str,
) -> DataFrame:
    """Shared two-sample frame for the rank-family monitors (KS, MW):
    per-(segment, value) ROW COUNTS carrying both sides in one frame —
    (segment, v, cr, cc) — built from one union + one aggregate. NULL
    values/segments are excluded on both sides (the one portable
    semantic; matches the bucketing monitors)."""

    def side(df: DataFrame, ca: str, cb: str) -> DataFrame:
        return (
            df.filter(
                F.col(value_col).isNotNull()
                & F.col(segment_col).isNotNull()
            )
            .groupBy(
                F.col(segment_col).alias("segment"),
                F.col(value_col).alias("v"),
            )
            .agg(F.count("*").cast("long").alias(ca))
            .withColumn(cb, F.lit(0).cast("long"))
        )

    return (
        side(reference, "cr", "cc")
        .unionByName(
            side(current, "cc", "cr").select("segment", "v", "cr", "cc")
        )
        .groupBy("segment", "v")
        .agg(F.sum("cr").alias("cr"), F.sum("cc").alias("cc"))
    )


def derive_segment_bucket_bounds(
    reference: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    segment_col: str,
    n_buckets: int,
) -> dict[str, list[float]]:
    """Per-SEGMENT n_buckets-tile bucket edges from the reference — ONE
    grouped distributed-quantile pass for every segment at once
    (operators/rank.py:exact_group_quantiles_interpolated; no per-segment
    jobs). The result is metadata: n_segments × (n_buckets − 1) floats,
    rounded 6 dp (engine-portable), pinning the binning per segment for
    every later comparison against this reference epoch."""
    from pipelinewise_spark.operators.rank import (
        exact_group_quantiles_interpolated,
    )

    qs = [i / n_buckets for i in range(1, n_buckets)]
    rows = exact_group_quantiles_interpolated(
        reference.filter(F.col(segment_col).isNotNull()).withColumn(
            "__seg", F.col(segment_col).cast("string")
        ),
        ["__seg"],
        value_col,
        list(tie_cols),
        qs,
    ).collect()
    out: dict[str, list[float]] = {}
    for r in rows:
        out.setdefault(r["__seg"], []).append(float(r["value"]))
    for seg, bs in out.items():
        bs.sort()
        if len(bs) < n_buckets - 1:
            raise ValueError(
                f"segment drift: segment {seg!r} has too few reference "
                f"rows to derive {n_buckets}-tile bounds"
            )
    return out


def _segment_bounds_frame(spark, bounds: dict[str, list[float]]):
    """(segment, es array<double>) — the broadcastable per-segment edge
    table (metadata-scale: one row per segment)."""
    return local_frame(spark, 
        [(seg, [float(x) for x in es]) for seg, es in sorted(bounds.items())],
        "segment string, es array<double>",
    )


def _segment_bucket_counts(
    df: DataFrame,
    bounds: dict[str, list[float]],
    value_col: str,
    segment_col: str,
    out: str,
) -> DataFrame:
    """(segment, bucket, <out>) counts with PER-SEGMENT edges: rows join
    the broadcast edge table on segment and bucket via the sorted-edge
    count ``#edges < value + 1`` — identical to the global
    :func:`_bucket_col` when-chain semantics (``v <= edge_i`` picks the
    first i). NULL values/segments excluded; rows whose segment has no
    reference bounds are out of the BUCKETED monitor's scope (an
    appeared segment is the scalar monitors' finding)."""
    bf = _segment_bounds_frame(df.sparkSession, bounds)
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull() & F.col(segment_col).isNotNull())
        .select(
            F.col(segment_col).cast("string").alias("segment"),
            v.alias("__v"),
        )
        .join(F.broadcast(bf), "segment")
        .select(
            "segment",
            (
                F.size(F.filter("es", lambda e: F.col("__v") > e)) + 1
            ).cast("int").alias("bucket"),
        )
        .groupBy("segment", "bucket")
        .agg(F.count("*").alias(out))
    )


def _segment_bucket_frame(spark, bounds: dict[str, list[float]],
                          n_buckets: int) -> DataFrame:
    rows = []
    for seg, es in sorted(bounds.items()):
        for i in range(n_buckets):
            rows.append((
                seg,
                i + 1,
                float(es[i - 1]) if i > 0 else None,
                float(es[i]) if i < n_buckets - 1 else None,
            ))
    return local_frame(spark, 
        rows, "segment string, bucket int, lo double, hi double"
    )


def _score_tvd_by_segment(per: DataFrame,
                          tvd_threshold_ppm: int) -> DataFrame:
    """(segment, bucket, lo, hi, ref_cnt, cur_cnt) → the per-SEGMENT
    drift report: each segment's integer-exact TVD (ppm) on its own
    rows. One groupBy over the answer-sized per frame; same decimal
    cross-multiplication as the global :func:`_score_tvd`."""
    tot = per.groupBy("segment").agg(
        F.sum("ref_cnt").alias("__nr"), F.sum("cur_cnt").alias("__nc")
    )
    scored = per.join(F.broadcast(tot), "segment").withColumn(
        "__absdiff",
        F.abs(
            F.col("ref_cnt").cast("decimal(38,0)") * F.col("__nc")
            - F.col("cur_cnt").cast("decimal(38,0)") * F.col("__nr")
        ),
    )
    tvd = scored.groupBy("segment").agg(
        F.when(F.max("__nc") == 0, F.lit(1_000_000))
        .otherwise(
            F.floor(
                (F.lit(1_000_000).cast("decimal(38,0)") * F.sum("__absdiff"))
                / (
                    F.lit(2).cast("decimal(38,0)")
                    * F.max("__nr")
                    * F.max("__nc")
                )
            )
        )
        .cast("long")
        .alias("tvd_ppm")
    )
    return (
        per.join(F.broadcast(tvd), "segment")
        .withColumn("drifted", F.col("tvd_ppm") > F.lit(tvd_threshold_ppm))
        .select(
            "segment", "bucket", "lo", "hi", "ref_cnt", "cur_cnt",
            "tvd_ppm", "drifted",
        )
    )


def distribution_drift_by_segment(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    segment_col: str,
    n_buckets: int = 10,
    tvd_threshold_ppm: int = 50_000,
) -> DataFrame:
    """Per-SEGMENT histogram drift: :func:`distribution_drift` grouped —
    each segment buckets by ITS OWN reference n_buckets-tile bounds and
    scores its own integer-exact TVD, so a shift confined to one segment
    can't be diluted by the rest of the table (the failure mode of the
    global monitor on segment-local regressions). Corpus cost: one
    grouped quantile-rank pass + one bucket-count aggregate per side —
    the same two passes as the global monitor, never per-segment jobs.

    Returns one row per (segment, bucket): (segment, bucket, lo, hi,
    ref_cnt, cur_cnt, tvd_ppm, drifted) with tvd_ppm/drifted per
    segment."""
    bounds = derive_segment_bucket_bounds(
        reference, value_col, tie_cols, segment_col, n_buckets
    )
    spark = reference.sparkSession
    per = (
        _segment_bucket_frame(spark, bounds, n_buckets)
        .join(
            F.broadcast(_segment_bucket_counts(
                reference, bounds, value_col, segment_col, "ref_cnt"
            )),
            ["segment", "bucket"], "left",
        )
        .join(
            F.broadcast(_segment_bucket_counts(
                current, bounds, value_col, segment_col, "cur_cnt"
            )),
            ["segment", "bucket"], "left",
        )
        .na.fill({"ref_cnt": 0, "cur_cnt": 0})
    )
    return _score_tvd_by_segment(per, tvd_threshold_ppm)


def ks_drift_by_segment(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    segment_col: str,
) -> DataFrame:
    """Per-SEGMENT two-sample Kolmogorov-Smirnov drift against a pinned
    reference epoch — the nightly feature-monitor composition of the
    KS machinery (queries/analytics.py:ks_test_price_priorities) with
    :func:`distribution_drift`'s reference-vs-current framing. Where the
    bucketed TVD monitor needs bounds from the reference, KS is bin-free:
    it compares whole CDFs, so a shape change INSIDE a bucket still
    registers.

    EXACT by the same construction as the global KS: per (segment, v)
    counts are integers, running counts come from the two-phase
    distributed prefix sum grouped BY SEGMENT (one range partitioning for
    every segment at once — no SinglePartition window, no per-segment
    jobs), and the sup-distance stays in cross-multiplied integer space
    ``max |cumR·n_cur − cumC·n_ref|`` with one trailing division into
    ppm. Significance is the alpha=0.05 two-sample bound
    ``D > 1.358·sqrt((n_r+n_c)/(n_r·n_c))`` in literal-coefficient IEEE
    arithmetic. A segment empty on either side (appeared/vanished since
    the reference epoch) is maximal drift by definition: d_ppm=1e6,
    significant=true.

    Returns one row per segment:
    (segment, n_ref, n_cur, d_ppm, significant).
    """
    pv = _two_sample_value_counts(reference, current, value_col, segment_col)
    return ks_drift_from_counts(pv)


def ks_drift_from_counts(pv: DataFrame) -> DataFrame:
    """KS drift from a prebuilt (segment, v, cr, cc) counts frame — the
    seam that lets :func:`~pipelinewise_spark.operators.monitors.
    quality_report` build the two-sample counts ONCE and feed both rank
    monitors (KS here, MW in :func:`mw_drift_from_counts`) instead of
    re-aggregating the corpus per monitor."""
    from pipelinewise_spark.functions.curation import group_prefix_sum

    cum = group_prefix_sum(pv, ["segment"], ["v"], "cr", out_col="cum_r")
    cum = group_prefix_sum(cum, ["segment"], ["v"], "cc", out_col="cum_c")
    n = pv.groupBy("segment").agg(
        F.sum("cr").alias("n_ref"), F.sum("cc").alias("n_cur")
    )
    # cross-multiplied terms in decimal(38,0) (_score_tvd's pattern; the
    # DuckDB twin is HUGEINT): plain LongType wraps silently in non-ANSI
    # Spark once cum·n or 1e6·d2 passes 2^63 (~3M rows/side/segment)
    dec = "decimal(38,0)"
    d = (
        cum.join(n, "segment")
        .groupBy("segment")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_r").cast(dec) * F.col("n_cur")
                    - F.col("cum_c").cast(dec) * F.col("n_ref")
                )
            ).alias("d2"),
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
        )
    )
    nr, nc = F.col("n_ref").cast("double"), F.col("n_cur")
    one_sided_empty = (F.col("n_ref") == 0) | (F.col("n_cur") == 0)
    return d.select(
        "segment",
        "n_ref",
        "n_cur",
        F.when(one_sided_empty, F.lit(1_000_000))
        .otherwise(
            F.floor(
                F.lit(1_000_000).cast(dec) * F.col("d2")
                / (F.col("n_ref").cast(dec) * F.col("n_cur"))
            )
        )
        .cast("long")
        .alias("d_ppm"),
        F.when(one_sided_empty, F.lit(True))
        .otherwise(
            F.col("d2").cast("double") / (nr * nc)
            > 1.358 * F.sqrt((F.col("n_ref") + F.col("n_cur")) / (nr * nc))
        )
        .alias("significant"),
    )


class StreamingDriftMonitor:
    """Ingest-time distribution monitoring: the TVD drift report
    (:func:`distribution_drift`) maintained INSIDE the stream instead of
    by a nightly batch job. The reference epoch pins the bucket bounds
    and reference counts ONCE; each micro-batch then folds its own
    bucket counts — a map-side-combinable n_buckets-row aggregate — into
    the monitor state, so the current report is available after every
    batch, not every night.

    State is deliberately METADATA-SCALE — and CONSTANT-size in stream
    length: bucket bounds (n_buckets − 1 floats), reference counts,
    accumulated current counts, and an applied-epoch HIGH-WATER MARK —
    one JSON sidecar through the MetaFS seam (s3://-capable), written
    atomically per batch. At-least-once foreachBatch redelivery is a
    no-op: batch ids are monotone per checkpoint (a redelivery replays
    the last uncommitted epoch), so ``epoch <= hwm`` is exactly "already
    folded" with O(1) state and O(1) membership (same guard pattern as
    streaming/mv.py, minus that module's per-epoch artifacts).

    Stream ≡ batch by construction: after draining a stream whose rows
    are exactly `current`, :meth:`report` equals
    ``distribution_drift(reference, current, ...)`` bucket-for-bucket —
    the fold is a sum of per-batch counts and addition is associative.
    """

    def __init__(
        self,
        reference: DataFrame,
        value_col: str,
        tie_cols: Sequence[str],
        state_dir: str,
        n_buckets: int = 10,
        tvd_threshold_ppm: int = 50_000,
    ):
        import json

        from pipelinewise_spark.operators.fsio import MetaFS

        self.value_col = value_col
        self.n_buckets = n_buckets
        self.threshold = tvd_threshold_ppm
        self.mfs = MetaFS(state_dir)
        import pyarrow.fs as _pafs

        if isinstance(self.mfs.fs, _pafs.LocalFileSystem):
            self.mfs.mkdirs()
        if self.mfs.exists("_drift_state.json"):
            self.state = json.loads(self.mfs.read_text("_drift_state.json"))
            if "applied_epochs" in self.state:  # pre-r10 state: ever-
                # growing list -> high-water mark + count (epochs are
                # monotone per checkpoint, so the mark is lossless)
                eps = self.state.pop("applied_epochs")
                self.state.setdefault(
                    "epoch_hwm", max(eps) if eps else None
                )
                self.state.setdefault("n_applied", len(eps))
            return
        bounds = derive_bucket_bounds(
            reference, value_col, tie_cols, n_buckets
        )
        ref_rows = _bucket_counts(
            reference, bounds, n_buckets, value_col, "ref_cnt"
        ).collect()  # n_buckets rows — metadata
        ref = {int(r["bucket"]): int(r["ref_cnt"]) for r in ref_rows}
        self.state = {
            "bounds": bounds,
            "ref": {str(b): ref.get(b, 0) for b in range(1, n_buckets + 1)},
            "cur": {str(b): 0 for b in range(1, n_buckets + 1)},
            # epoch bookkeeping is O(1), not an ever-growing list: batch
            # ids are monotone per checkpoint (a foreachBatch redelivery
            # replays the LAST uncommitted epoch), so "epoch <= high-water
            # mark" is exactly "already applied" — constant-size state and
            # O(1) membership at any stream length
            "epoch_hwm": None,
            "n_applied": 0,
        }
        self._save()

    def _save(self) -> None:
        import json

        self.mfs.write_text(
            json.dumps(self.state), "_drift_state.json", atomic=True
        )

    def on_batch(self, batch: DataFrame, epoch: int) -> None:
        """Fold one micro-batch's bucket counts into the monitor.
        Idempotent per epoch (at-least-once transport safe)."""
        hwm = self.state.get("epoch_hwm")
        if hwm is not None and epoch <= hwm:
            return
        rows = _bucket_counts(
            batch, self.state["bounds"], self.n_buckets, self.value_col,
            "n",
        ).collect()  # n_buckets rows — metadata
        for r in rows:
            k = str(int(r["bucket"]))
            self.state["cur"][k] = self.state["cur"].get(k, 0) + int(r["n"])
        self.state["epoch_hwm"] = (
            epoch if hwm is None else max(hwm, epoch)
        )
        self.state["n_applied"] = self.state.get("n_applied", 0) + 1
        self._save()

    def report(self, spark) -> DataFrame:
        """The same (bucket, lo, hi, ref_cnt, cur_cnt, tvd_ppm, drifted)
        frame :func:`distribution_drift` emits, from the folded state."""
        bounds = self.state["bounds"]
        per = _bucket_frame(spark, bounds, self.n_buckets)
        counts = local_frame(spark, 
            [
                (
                    b,
                    int(self.state["ref"].get(str(b), 0)),
                    int(self.state["cur"].get(str(b), 0)),
                )
                for b in range(1, self.n_buckets + 1)
            ],
            "bucket int, ref_cnt long, cur_cnt long",
        )
        return _score_tvd(per.join(counts, "bucket"), self.threshold)


class SegmentedStreamingDriftMonitor:
    """:class:`StreamingDriftMonitor` at the SEGMENT level — production
    monitors segment, because a shift confined to one segment dilutes
    into noise in a global fold. The reference epoch pins PER-SEGMENT
    bucket bounds (one grouped quantile pass for all segments) and
    reference counts once; each micro-batch folds one
    (segment, bucket)-grouped aggregate — still a single
    map-side-combinable job per batch, still metadata-scale state
    (n_segments × n_buckets counts + the epoch high-water mark, one JSON
    sidecar through MetaFS, written atomically, at-least-once-safe by
    the same monotone-epoch guard).

    Stream ≡ batch by construction: after draining a stream whose rows
    are exactly `current`, :meth:`report` equals
    :func:`distribution_drift_by_segment` row-for-row (the fold is a sum
    of per-batch counts; addition is associative). Batch rows in
    segments absent from the reference epoch are out of the bucketed
    monitor's scope on BOTH paths (the scalar monitors own appeared
    segments)."""

    def __init__(
        self,
        reference: DataFrame,
        value_col: str,
        tie_cols: Sequence[str],
        segment_col: str,
        state_dir: str,
        n_buckets: int = 10,
        tvd_threshold_ppm: int = 50_000,
    ):
        import json

        from pipelinewise_spark.operators.fsio import MetaFS

        self.value_col = value_col
        self.segment_col = segment_col
        self.n_buckets = n_buckets
        self.threshold = tvd_threshold_ppm
        self.mfs = MetaFS(state_dir)
        import pyarrow.fs as _pafs

        if isinstance(self.mfs.fs, _pafs.LocalFileSystem):
            self.mfs.mkdirs()
        if self.mfs.exists("_drift_state.json"):
            self.state = json.loads(self.mfs.read_text("_drift_state.json"))
            return
        bounds = derive_segment_bucket_bounds(
            reference, value_col, tie_cols, segment_col, n_buckets
        )
        ref_rows = _segment_bucket_counts(
            reference, bounds, value_col, segment_col, "ref_cnt"
        ).collect()  # n_segments x n_buckets rows — metadata
        zero = {
            seg: {str(b): 0 for b in range(1, n_buckets + 1)}
            for seg in bounds
        }
        ref = {seg: dict(z) for seg, z in zero.items()}
        for r in ref_rows:
            ref[r["segment"]][str(int(r["bucket"]))] = int(r["ref_cnt"])
        self.state = {
            "bounds": bounds,
            "ref": ref,
            "cur": zero,
            "epoch_hwm": None,
            "n_applied": 0,
        }
        self._save()

    def _save(self) -> None:
        import json

        self.mfs.write_text(
            json.dumps(self.state), "_drift_state.json", atomic=True
        )

    def on_batch(self, batch: DataFrame, epoch: int) -> None:
        """Fold one micro-batch's (segment, bucket) counts into the
        monitor. Idempotent per epoch (at-least-once transport safe)."""
        hwm = self.state.get("epoch_hwm")
        if hwm is not None and epoch <= hwm:
            return
        rows = _segment_bucket_counts(
            batch, self.state["bounds"], self.value_col, self.segment_col,
            "n",
        ).collect()  # n_segments x n_buckets rows — metadata
        for r in rows:
            seg, b = r["segment"], str(int(r["bucket"]))
            cur = self.state["cur"][seg]
            cur[b] = cur.get(b, 0) + int(r["n"])
        self.state["epoch_hwm"] = (
            epoch if hwm is None else max(hwm, epoch)
        )
        self.state["n_applied"] = self.state.get("n_applied", 0) + 1
        self._save()

    def report(self, spark) -> DataFrame:
        """The same (segment, bucket, lo, hi, ref_cnt, cur_cnt, tvd_ppm,
        drifted) frame :func:`distribution_drift_by_segment` emits, from
        the folded state."""
        bounds = self.state["bounds"]
        per = _segment_bucket_frame(spark, bounds, self.n_buckets)
        counts = local_frame(spark, 
            [
                (
                    seg,
                    b,
                    int(self.state["ref"][seg].get(str(b), 0)),
                    int(self.state["cur"][seg].get(str(b), 0)),
                )
                for seg in sorted(bounds)
                for b in range(1, self.n_buckets + 1)
            ],
            "segment string, bucket int, ref_cnt long, cur_cnt long",
        )
        return _score_tvd_by_segment(
            per.join(counts, ["segment", "bucket"]), self.threshold
        )


def segment_scalar_drift(
    ref_per_segment: DataFrame,
    cur_per_segment: DataFrame,
    ref_name: str,
    cur_name: str,
    threshold_ppm: int,
) -> DataFrame:
    """Shared frame for the per-segment SCALAR monitors (row volume,
    distinct-key cardinality, any one-number-per-segment statistic):
    given two answer-sized (segment, <scalar>) frames — one aggregate
    pass per side upstream — full-outer join on segment, default absent
    segments to 0, and score ``|cur − ref| / ref`` in ppm with the
    integer division LAST. Segments empty in the reference are maximal
    drift by definition (a segment that APPEARED since the epoch is as
    alarming as one that vanished).

    Returns (segment, <ref_name>, <cur_name>, delta_ppm, drifted)."""
    j = ref_per_segment.join(cur_per_segment, "segment", "full").select(
        "segment",
        F.coalesce(ref_name, F.lit(0)).alias(ref_name),
        F.coalesce(cur_name, F.lit(0)).alias(cur_name),
    )
    delta = F.when(F.col(ref_name) == 0, F.lit(1_000_000)).otherwise(
        F.floor(
            1_000_000
            * F.abs(F.col(cur_name) - F.col(ref_name))
            / F.col(ref_name)
        )
    ).cast("long")
    return j.select(
        "segment",
        ref_name,
        cur_name,
        delta.alias("delta_ppm"),
        (delta > F.lit(int(threshold_ppm))).alias("drifted"),
    )


def cardinality_drift(
    reference: DataFrame,
    current: DataFrame,
    key_col: str,
    segment_col: str,
    threshold_ppm: int = 200_000,
) -> DataFrame:
    """Per-segment distinct-key cardinality drift vs a pinned reference
    epoch — the fifth face of the observability matrix (volume,
    distribution [TVD/KS], freshness, schema, CARDINALITY): "did the
    number of distinct users/accounts/devices in this segment silently
    jump or collapse since the reference epoch?" catches id-space bugs
    (key truncation, default-value floods, duplicated upstream loads)
    that value-distribution monitors miss.

    Exact and engine-portable: two countDistinct aggregates (one pass per
    side), then the shared :func:`segment_scalar_drift` frame (segment
    full-outer join on answer-sized frames; the delta leaves integer
    space only in the final ppm division). At 100 TB swap the exact
    countDistinct for the HLL sketch table —
    :func:`cardinality_drift_hll` is that swap as a real code path with
    the same report contract.

    Returns (segment, ref_distinct, cur_distinct, delta_ppm, drifted).
    """

    def side(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(
                F.col(key_col).isNotNull() & F.col(segment_col).isNotNull()
            )
            .groupBy(F.col(segment_col).alias("segment"))
            .agg(F.countDistinct(key_col).cast("long").alias(out))
        )

    return segment_scalar_drift(
        side(reference, "ref_distinct"),
        side(current, "cur_distinct"),
        "ref_distinct",
        "cur_distinct",
        threshold_ppm,
    )


def cardinality_drift_hll(
    reference: DataFrame,
    current: DataFrame,
    key_col: str,
    segment_col: str,
    threshold_ppm: int = 200_000,
    lgk: int = 14,
) -> DataFrame:
    """The 100 TB form of :func:`cardinality_drift`: per-segment distinct
    counts come from Apache DataSketches HLL sketches
    (operators/sketches.py — ~0.8% standard error at lgK=14) instead of
    exact countDistinct, with the SAME report contract. The exact
    monitor's countDistinct shuffles every distinct (segment, key) pair;
    the sketch build is one map-side-combinable aggregate whose shuffle
    moves KB-sized registers — and in production the reference side
    comes from the warehouse's standing sketch table
    (:func:`~pipelinewise_spark.operators.sketches.hll_sketch_table`)
    without rescanning the epoch at all, which is why the swap matters.

    Returns (segment, ref_distinct, cur_distinct, delta_ppm, drifted) —
    distinct counts are HLL ESTIMATES; thresholds must exceed the sketch
    error envelope (the default 20% is 25x the lgK=14 standard error).
    """
    from pipelinewise_spark.operators.sketches import (
        hll_rollup,
        hll_sketch_table,
    )

    def side(df: DataFrame, out: str) -> DataFrame:
        clean = df.filter(
            F.col(key_col).isNotNull() & F.col(segment_col).isNotNull()
        ).select(F.col(segment_col).alias("segment"), key_col)
        return hll_rollup(
            hll_sketch_table(clean, ["segment"], key_col, lgk=lgk),
            ["segment"],
            out_col=out,
        )

    return segment_scalar_drift(
        side(reference, "ref_distinct"),
        side(current, "cur_distinct"),
        "ref_distinct",
        "cur_distinct",
        threshold_ppm,
    )


def volume_drift(
    reference: DataFrame,
    current: DataFrame,
    segment_col: str,
    threshold_ppm: int = 200_000,
) -> DataFrame:
    """Per-segment ROW-VOLUME drift vs a pinned reference epoch — the
    epoch-framed face of volume observability (operators/anomaly.py
    watches per-commit deltas over a table's own history; this watches
    "did this segment's row count jump or collapse since the reference
    epoch", the same question the other epoch monitors ask of values,
    ranks, and cardinalities). One count aggregate per side, then the
    shared :func:`segment_scalar_drift` frame.

    Returns (segment, ref_rows, cur_rows, delta_ppm, drifted)."""

    def side(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(F.col(segment_col).isNotNull())
            .groupBy(F.col(segment_col).alias("segment"))
            .agg(F.count("*").cast("long").alias(out))
        )

    return segment_scalar_drift(
        side(reference, "ref_rows"),
        side(current, "cur_rows"),
        "ref_rows",
        "cur_rows",
        threshold_ppm,
    )


def mw_drift_by_segment(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    segment_col: str,
    effect_threshold_ppm: int = 100_000,
) -> DataFrame:
    """Per-segment Mann-Whitney LOCATION drift vs a pinned reference
    epoch — the rank-sum sibling of :func:`ks_drift_by_segment` (KS sees
    any CDF shape change; MW isolates "did the typical value move up or
    down", robust to outliers and monotone transforms). Together with
    the TVD monitor they complete the VERDICT-asked nightly family.

    EXACT: tie-averaged ranks stay in doubled-integer space
    (2·rank_min + ties − 1); within-segment rank_min derives from the
    SEGMENT-grouped two-phase prefix sum over the per-(segment, value)
    count table (one range partitioning for every segment, no
    SinglePartition window): rank_min(v) = cum(v) − cnt(v) + 1. The
    common-language effect size U_ref/(n_ref·n_cur) leaves integer space
    only in the final ppm division; drift flags when it deviates from
    the no-shift 500000 ppm by more than ``effect_threshold_ppm``.
    Segments empty on either side are maximal drift by definition
    (effect pinned to 1e6).

    Returns (segment, n_ref, n_cur, u_ref_x2, effect_ppm, drifted) —
    ``u_ref_x2`` is 2·U_ref (integer-exact even when tie-averaged ranks
    are half-integers).
    """
    pv = _two_sample_value_counts(reference, current, value_col, segment_col)
    return mw_drift_from_counts(pv, effect_threshold_ppm)


def mw_drift_from_counts(
    pv: DataFrame, effect_threshold_ppm: int = 100_000
) -> DataFrame:
    """Mann-Whitney drift from a prebuilt (segment, v, cr, cc) counts
    frame (see :func:`ks_drift_from_counts` for why the seam exists)."""
    from pipelinewise_spark.functions.curation import group_prefix_sum

    pv = pv.withColumn("cv", F.col("cr") + F.col("cc"))
    cum = group_prefix_sum(pv, ["segment"], ["v"], "cv", out_col="cum")
    # doubled tie-averaged rank of value v within its segment:
    # 2*rank_min + ties - 1 = 2*(cum - cv + 1) + cv - 1 = 2*cum - cv + 1.
    # Rank products in decimal(38,0) (_score_tvd's pattern; DuckDB's
    # SUM(BIGINT) is HUGEINT): cr·r2 and its segment sum wrap silently in
    # non-ANSI LongType once n_ref·n passes 2^63 (~3M rows/side/segment)
    dec = "decimal(38,0)"
    ranked = cum.withColumn(
        "r2", F.lit(2).cast(dec) * F.col("cum") - F.col("cv") + 1
    )
    agg = ranked.groupBy("segment").agg(
        F.sum(F.col("cr").cast(dec) * F.col("r2")).alias("rr2"),
        F.sum("cr").alias("n_ref"),
        F.sum("cc").alias("n_cur"),
    )
    # 2*U_ref = R_ref_doubled - n_ref*(n_ref+1)  (all integer)
    u2 = F.col("rr2") - F.col("n_ref").cast(dec) * (F.col("n_ref") + 1)
    empty = (F.col("n_ref") == 0) | (F.col("n_cur") == 0)
    effect = F.when(empty, F.lit(1_000_000)).otherwise(
        F.floor(
            F.lit(1_000_000).cast(dec) * u2
            / (F.lit(2).cast(dec) * F.col("n_ref") * F.col("n_cur"))
        )
    ).cast("long")
    return agg.select(
        "segment",
        "n_ref",
        "n_cur",
        u2.cast("long").alias("u_ref_x2"),
        effect.alias("effect_ppm"),
        (
            F.abs(effect - F.lit(500_000))
            > F.lit(int(effect_threshold_ppm))
        ).alias("drifted"),
    )


def vocab_drift(
    reference: DataFrame,
    current: DataFrame,
    text_col: str,
    top_k: int = 200,
    threshold_ppm: int = 50_000,
) -> DataFrame:
    """Text-corpus VOCABULARY drift — the text face of the drift family
    (scraper breakage, template injection, language-mix shifts: corpus
    pathologies that never touch a numeric column). The reference epoch
    pins the comparison alphabet — its ``top_k`` terms by frequency
    (term tie-break) plus one ``(oov)`` bucket absorbing every other
    token — and both epochs' token masses over that alphabet compare by
    integer-exact TVD (cross-multiplied in decimal(38,0), ppm at the
    very end — :func:`_score_tvd`'s arithmetic on a term-keyed frame).

    Shapes: one tokenize+count pass per epoch (map-side combinable,
    vocab-sized shuffle — Zipf-bounded ≪ token count); top-K selection
    rides the distributed rank (operators/rank.py — never a
    SinglePartition window over the vocabulary); the alphabet
    broadcasts (top_k rows); the report is top_k+1 rows.

    Returns (term, ref_cnt, cur_cnt, ref_ppm, cur_ppm, tvd_ppm,
    drifted): counts are token occurrences, ppm shares are of each
    epoch's TOTAL token mass, tvd/drifted are table-wide on every row
    (the family's report shape). An epoch with zero tokens is maximal
    drift by definition (tvd = 1e6), mirroring _score_tvd's empty-side
    rule."""
    from pipelinewise_spark.functions.text import tokens
    from pipelinewise_spark.operators.rank import distributed_row_number
    from pipelinewise_spark.partitioning import spread

    def _term_counts(df: DataFrame) -> DataFrame:
        return (
            spread(df)
            .select(F.explode(tokens(F.col(text_col))).alias("term"))
            .filter(F.length("term") > 0)
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    ref_tc = _term_counts(reference)
    cur_tc = _term_counts(current)
    vocab = (
        distributed_row_number(
            ref_tc, [F.col("cnt").desc(), "term"], "__r"
        )
        .filter(F.col("__r") <= F.lit(int(top_k)))
        .select("term")
    )
    rv = ref_tc.join(F.broadcast(vocab), "term").withColumnRenamed(
        "cnt", "ref_cnt"
    )
    cv = cur_tc.join(F.broadcast(vocab), "term").withColumnRenamed(
        "cnt", "cur_cnt"
    )
    in_alpha = (
        vocab.join(rv, "term", "left")
        .join(cv, "term", "left")
        .na.fill({"ref_cnt": 0, "cur_cnt": 0})
    )
    zero = F.lit(0).cast("long")
    rtot = ref_tc.agg(
        F.coalesce(F.sum("cnt"), zero).alias("__rt")
    )
    ctot = cur_tc.agg(
        F.coalesce(F.sum("cnt"), zero).alias("__ct")
    )
    rin = in_alpha.agg(F.coalesce(F.sum("ref_cnt"), zero).alias("__ri"))
    cin = in_alpha.agg(F.coalesce(F.sum("cur_cnt"), zero).alias("__ci"))
    oov = (
        rtot.crossJoin(F.broadcast(ctot))
        .crossJoin(F.broadcast(rin))
        .crossJoin(F.broadcast(cin))
        .select(
            F.lit("(oov)").alias("term"),
            (F.col("__rt") - F.col("__ri")).cast("long").alias("ref_cnt"),
            (F.col("__ct") - F.col("__ci")).cast("long").alias("cur_cnt"),
        )
    )
    per = in_alpha.unionByName(oov)
    tot = per.agg(
        F.sum("ref_cnt").alias("__nr"), F.sum("cur_cnt").alias("__nc")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = per.crossJoin(F.broadcast(tot)).withColumn(
        "__absdiff",
        F.abs(
            dec(F.col("ref_cnt")) * F.col("__nc")
            - dec(F.col("cur_cnt")) * F.col("__nr")
        ),
    )
    tvd = scored.agg(
        F.when(
            (F.max("__nr") == 0) | (F.max("__nc") == 0), F.lit(1_000_000)
        )
        .otherwise(
            F.floor(
                (dec(F.lit(1_000_000)) * F.sum("__absdiff"))
                / (dec(F.lit(2)) * F.max("__nr") * F.max("__nc"))
            )
        )
        .cast("long")
        .alias("tvd_ppm")
    )
    ppm = lambda cnt, n: (  # noqa: E731 — exact share, 0 on an empty epoch
        F.when(n > 0, F.floor(dec(F.lit(1_000_000)) * cnt / dec(n)))
        .otherwise(0)
        .cast("long")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tvd))
        .select(
            "term",
            "ref_cnt",
            "cur_cnt",
            ppm(F.col("ref_cnt"), F.col("__nr")).alias("ref_ppm"),
            ppm(F.col("cur_cnt"), F.col("__nc")).alias("cur_ppm"),
            "tvd_ppm",
            (F.col("tvd_ppm") > F.lit(int(threshold_ppm))).alias(
                "drifted"
            ),
        )
    )


class StreamingKSMonitor:
    """APPROXIMATE per-segment Kolmogorov-Smirnov drift AT INGEST — the
    missing stream twin of :func:`ks_drift_by_segment`, which stays
    nightly-batch because exact KS needs the per-(segment, value) count
    table (value-domain-scale state no bounded monitor should hold).
    This monitor closes the batch/stream asymmetry with an O(segments ×
    n_buckets) histogram-sketch CDF and a PROVABLE error bound — and
    the SAME drained state brackets the other nightly-only rank verb,
    Mann-Whitney (:meth:`mw_report`), so one ingest fold serves the
    full rank-monitor family:

    - PIN (reference epoch, once): per-segment ``n_buckets``-tile edges
      (one grouped distributed-quantile pass) and the reference's EXACT
      cumulative counts at those edges — bucketing by ``#edges < v``
      makes the CDF at each edge value exact on both sides, duplicate
      edges included;
    - FOLD (per micro-batch): one (segment, bucket)-grouped aggregate,
      sum-mergeable — identical shape/state discipline to
      :class:`SegmentedStreamingDriftMonitor` (metadata-scale JSON via
      MetaFS, monotone-epoch guard, at-least-once-safe);
    - DRAIN: the edge-restricted sup ``d_lo = max_i |F_r(e_i) −
      F_c(e_i)|`` is a certain LOWER bound on the true KS statistic
      (the CDFs are exact at the edges and the sup ranges over a subset
      of the value axis), and ``d_hi = d_lo + max_i min(r_i/n_r,
      c_i/n_c)`` is a certain UPPER bound: for v inside bucket i,
      monotonicity gives F_r(v) − F_c(v) ≤ [F_r(e_{i−1}) − F_c(e_{i−1})]
      + r_i/n_r and ≤ [F_r(e_i) − F_c(e_i)] + c_i/n_c (symmetrically
      for F_c − F_r), so the true sup exceeds the edge sup by at most
      the smaller one-side bucket mass. With reference-B-tile edges
      r_i/n_r ≈ 1/n_buckets, so the bound width is ~1e6/n_buckets ppm
      at worst and usually far tighter on the current side.

    Everything stays in exact integer space (Python bigints over the
    drained counts; the per-batch fold is count addition), so
    ``d_lo_ppm ≤ exact_d_ppm ≤ d_hi_ppm`` is a checkable contract
    against :func:`ks_drift_by_segment` on the same rows — asserted in
    tests and in the registry query's oracle. NULL values/segments are
    excluded on both sides and segments absent from the reference epoch
    are out of scope, exactly like the exact batch KS
    (:func:`_two_sample_value_counts`) and the bucketed TVD monitor.

    Returns from :meth:`report`: (segment, n_ref, n_cur, d_lo_ppm,
    d_hi_ppm, err_bound_ppm, significant) — ``significant`` is the
    alpha=0.05 two-sample test applied to the CONSERVATIVE d_hi (a
    monitor should page on "may have drifted past the bound", and the
    d_lo/d_hi pair tells the operator how much of that is bucketing
    slack)."""

    def __init__(
        self,
        reference: DataFrame,
        value_col: str,
        tie_cols: Sequence[str],
        segment_col: str,
        state_dir: str,
        n_buckets: int = 64,
    ):
        import json

        import pyarrow.fs as _pafs

        from pipelinewise_spark.operators.fsio import MetaFS

        self.value_col = value_col
        self.segment_col = segment_col
        self.n_buckets = n_buckets
        self.mfs = MetaFS(state_dir)
        if isinstance(self.mfs.fs, _pafs.LocalFileSystem):
            self.mfs.mkdirs()
        if self.mfs.exists("_ks_state.json"):
            self.state = json.loads(self.mfs.read_text("_ks_state.json"))
            self.n_buckets = int(self.state["n_buckets"])
            return
        bounds = derive_segment_bucket_bounds(
            reference, value_col, tie_cols, segment_col, n_buckets
        )
        ref_rows = _segment_bucket_counts(
            reference, bounds, value_col, segment_col, "ref_cnt"
        ).collect()  # n_segments x n_buckets rows — metadata
        zero = {
            seg: {str(b): 0 for b in range(1, n_buckets + 1)}
            for seg in bounds
        }
        ref = {seg: dict(z) for seg, z in zero.items()}
        for r in ref_rows:
            ref[r["segment"]][str(int(r["bucket"]))] = int(r["ref_cnt"])
        self.state = {
            "n_buckets": n_buckets,
            "bounds": bounds,
            "ref": ref,
            "cur": zero,
            "epoch_hwm": None,
            "n_applied": 0,
        }
        self._save()

    @classmethod
    def from_state(cls, state_dir: str) -> "StreamingKSMonitor":
        """Attach to an EXISTING state dir without a reference frame —
        the drain/report path for operational tooling (a resumed
        monitor never rescans the reference anyway; state wins).
        Raises when no state sidecar exists."""
        import json

        from pipelinewise_spark.operators.fsio import MetaFS

        mfs = MetaFS(state_dir)
        if not mfs.exists("_ks_state.json"):
            raise ValueError(
                f"{state_dir} has no _ks_state.json — not a "
                "StreamingKSMonitor state dir"
            )
        mon = cls.__new__(cls)
        mon.mfs = mfs
        mon.state = json.loads(mfs.read_text("_ks_state.json"))
        mon.n_buckets = int(mon.state["n_buckets"])
        mon.value_col = None
        mon.segment_col = None
        return mon

    def _save(self) -> None:
        import json

        self.mfs.write_text(
            json.dumps(self.state), "_ks_state.json", atomic=True
        )

    def on_batch(self, batch: DataFrame, epoch: int) -> None:
        """Fold one micro-batch's (segment, bucket) counts. Idempotent
        per epoch (at-least-once transport safe)."""
        hwm = self.state.get("epoch_hwm")
        if hwm is not None and epoch <= hwm:
            return
        rows = _segment_bucket_counts(
            batch, self.state["bounds"], self.value_col, self.segment_col,
            "n",
        ).collect()  # n_segments x n_buckets rows — metadata
        for r in rows:
            seg, b = r["segment"], str(int(r["bucket"]))
            cur = self.state["cur"][seg]
            cur[b] = cur.get(b, 0) + int(r["n"])
        self.state["epoch_hwm"] = (
            epoch if hwm is None else max(hwm, epoch)
        )
        self.state["n_applied"] = self.state.get("n_applied", 0) + 1
        self._save()

    def report(self, spark) -> DataFrame:
        """(segment, n_ref, n_cur, d_lo_ppm, d_hi_ppm, err_bound_ppm,
        significant) from the folded state — exact bigint arithmetic
        over O(segments × n_buckets) drained counts; the only floats
        are the literal-coefficient significance test."""
        B = self.n_buckets
        out = []
        for seg in sorted(self.state["bounds"]):
            rc = [
                int(self.state["ref"][seg].get(str(b), 0))
                for b in range(1, B + 1)
            ]
            cc = [
                int(self.state["cur"][seg].get(str(b), 0))
                for b in range(1, B + 1)
            ]
            n_r, n_c = sum(rc), sum(cc)
            if n_r == 0 or n_c == 0:
                out.append((seg, n_r, n_c, 1_000_000, 1_000_000, 0, True))
                continue
            d2 = 0
            cum_r = cum_c = 0
            for i in range(B - 1):  # CDFs at the B-1 edges
                cum_r += rc[i]
                cum_c += cc[i]
                d2 = max(d2, abs(cum_r * n_c - cum_c * n_r))
            mass2 = max(min(r * n_c, c * n_r) for r, c in zip(rc, cc))
            denom = n_r * n_c
            # floor is monotone and the exact statistic's d2 satisfies
            # d2 <= d2_exact <= d2 + mass2 in integer space, so
            # d_lo_ppm <= exact_d_ppm <= d_hi_ppm with plain floors
            d_lo = (1_000_000 * d2) // denom
            d_hi = (1_000_000 * (d2 + mass2)) // denom
            # operand-converted IEEE arithmetic (cast each exact integer
            # to double, THEN divide) — the evaluation order every SQL
            # engine uses, so the boolean is engine-portable even when
            # d2 + mass2 exceeds 2^53
            fden = float(n_r) * float(n_c)
            sig = float(d2 + mass2) / fden > 1.358 * (
                (n_r + n_c) / fden
            ) ** 0.5
            out.append(
                (seg, n_r, n_c, d_lo, d_hi, d_hi - d_lo, bool(sig))
            )
        return local_frame(spark, 
            out,
            "segment string, n_ref long, n_cur long, d_lo_ppm long, "
            "d_hi_ppm long, err_bound_ppm long, significant boolean",
        )

    def mw_report(
        self, spark, effect_threshold_ppm: int = 100_000
    ) -> DataFrame:
        """Mann-Whitney LOCATION drift from the SAME drained histogram
        state — the second rank verb the nightly batch matrix owns
        (:func:`mw_drift_from_counts`), bracketed exactly like
        :meth:`report` brackets KS: cross-bucket pairs are fully
        ORDERED by the interval partition (ref in bucket a, cur in
        bucket b<a ⇒ ref > e_{a−1} ≥ e_b ≥ cur, strict even with
        duplicate edges), so the doubled U-statistic satisfies the
        certain integer sandwich

            u2_lo = 2·Σ_a r_a·C(a−1)  ≤  u2_exact  ≤  u2_lo + 2·Σ_b r_b·c_b

        (same-bucket pairs contribute anywhere in [0, r_b·c_b] each,
        ties included at ½). The common-language effect brackets by
        floor monotonicity: effect_lo_ppm ≤ exact effect_ppm ≤
        effect_hi_ppm, checkable against the batch twin on the same
        rows. ``drifted`` is the CONSERVATIVE page-on-possibility flag:
        true when the bracket is not fully inside
        [0.5 − t, 0.5 + t] — the d_lo/d_hi pair tells the operator how
        much is bucketing slack (width ≈ 1e6/n_buckets ppm).

        Returns (segment, n_ref, n_cur, u2_lo, u2_hi, effect_lo_ppm,
        effect_hi_ppm, err_bound_ppm, drifted)."""
        B = self.n_buckets
        t = int(effect_threshold_ppm)
        out = []
        for seg in sorted(self.state["bounds"]):
            rc = [
                int(self.state["ref"][seg].get(str(b), 0))
                for b in range(1, B + 1)
            ]
            cc = [
                int(self.state["cur"][seg].get(str(b), 0))
                for b in range(1, B + 1)
            ]
            n_r, n_c = sum(rc), sum(cc)
            if n_r == 0 or n_c == 0:
                out.append(
                    (seg, n_r, n_c, 0, 0, 1_000_000, 1_000_000, 0, True)
                )
                continue
            u2_lo = 0
            cum_c = 0
            same2 = 0
            for a in range(B):
                u2_lo += 2 * rc[a] * cum_c  # cur strictly below bucket a
                same2 += 2 * rc[a] * cc[a]
                cum_c += cc[a]
            u2_hi = u2_lo + same2
            denom2 = 2 * n_r * n_c
            e_lo = (1_000_000 * u2_lo) // denom2
            e_hi = (1_000_000 * u2_hi) // denom2
            drifted = (e_hi > 500_000 + t) or (e_lo < 500_000 - t)
            out.append(
                (seg, n_r, n_c, u2_lo, u2_hi, e_lo, e_hi, e_hi - e_lo,
                 bool(drifted))
            )
        return local_frame(spark, 
            out,
            "segment string, n_ref long, n_cur long, u2_lo long, "
            "u2_hi long, effect_lo_ppm long, effect_hi_ppm long, "
            "err_bound_ppm long, drifted boolean",
        )
