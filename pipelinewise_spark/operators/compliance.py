"""Privacy compliance: re-identification risk measurement (k-anonymity /
l-diversity) and right-to-be-forgotten physical erasure across live data
AND history.

The reference's hard delete (target_snowflake/db_sync.py:632-637)
removes rows from the LIVE table only; a warehouse with snapshots,
deletion vectors and retained load archives still holds the bytes. This
verb composes the table services into actual erasure:

1. ``delete_where`` — the rows leave every live read immediately
   (deletion-vector sidecar, no rewrite yet);
2. ``compact(max_dead_ratio≈0)`` — every partition carrying vectored
   dead rows REWRITES, so the surviving data files no longer contain
   the subject's bytes;
3. ``expire_snapshots(everything but live)`` + ``vacuum`` — historical
   manifests that still reference the pre-delete files are dropped and
   the files physically deleted.

Cost at 100 TB: step 1 is answer-sized; step 2 rewrites only partitions
the subject appeared in; step 3 is manifest arithmetic + file deletes.
Time travel across the erasure horizon is gone by design — that is the
point. Branch heads still pin their snapshots (vacuum protects them);
drop or re-stage branches before forgetting, or the erasure is
incomplete and this function reports the surviving refs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Quasi-identifier re-identification risk report — the measurement
    side of the privacy story whose erasure side is :func:`forget`.

    Groups the table by the quasi-identifier tuple (the columns an
    attacker could link against an external dataset) and reports, per
    equivalence class: ``class_size`` (the k-anonymity of every record
    in the class — a record in a class of 1 is uniquely re-identifiable),
    ``l_diversity`` (distinct ``sensitive_col`` values in the class; a
    class can be k-anonymous yet leak its attribute when every member
    shares one sensitive value — l=1), and ``at_risk`` (class_size < k).

    Scale shape: ONE map-side-combinable groupBy on the quasi tuple
    (count + count-distinct); the answer is class-count-sized, bounded
    by the quasi-domain product, never row-scale. No windows, no joins.
    Publishing-side mitigation (generalize / suppress the at-risk
    classes) stays with the caller — this verb only measures.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).cast("long").alias("l_diversity")
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    if sensitive_col is None:
        # with no sensitive attribute, the class itself is the secret:
        # diversity degenerates to the class size
        out = out.withColumn("l_diversity", F.col("class_size"))
    return out.withColumn("at_risk", F.col("class_size") < F.lit(int(k)))


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """One-row release-gate summary over :func:`k_anonymity_report`:
    ``k_anonymity`` (min class size — the dataset's k), ``l_diversity``
    (min per-class distinct sensitive values — the dataset's l),
    ``n_classes``, ``rows_at_risk`` and ``at_risk_ppm`` (integer ppm of
    rows living in classes smaller than ``k``). Report-sized input, so
    the final aggregate is metadata-scale."""
    rep = k_anonymity_report(df, quasi_cols, sensitive_col, k)
    return rep.agg(
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.min("l_diversity").cast("long").alias("l_diversity"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("at_risk"), F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.floor(
            F.lit(1000000)
            * F.sum(
                F.when(F.col("at_risk"), F.col("class_size")).otherwise(0)
            )
            / F.sum("class_size")
        )
        .cast("long")
        .alias("at_risk_ppm"),
    )


def forget(
    spark: SparkSession,
    table,
    condition,
    force_history_purge: bool = False,
) -> dict:
    """Erase all rows matching ``condition`` from ``table`` (a
    ManifestTable), including historical snapshots. Returns counts plus
    any branch refs that still pin old snapshots.

    A predicate matching ZERO rows performs NO destructive step: nothing
    was found to erase, so destroying the table's snapshot history and
    time travel would be a pure loss (e.g. a typo'd WHERE clause). The
    zero count comes back so the caller can correct the predicate. Pass
    ``force_history_purge=True`` to expire/vacuum anyway — the one
    legitimate case is re-running an erasure whose first attempt deleted
    the rows but died before the history purge."""
    deleted = table.delete_where(spark, condition)
    rewritten = 0
    expired: list = []
    if deleted:
        # any partition with vectored dead rows rewrites (dead=0 stays)
        rewritten = table.compact(
            spark, min_files=10**9, max_dead_ratio=1e-300
        )
    if deleted or force_history_purge:
        expired = table.expire_snapshots(
            "9999-12-31 23:59:59", keep_last=1
        )
        table.vacuum(keep_manifests=1)
    return {
        "deleted_rows": deleted,
        "rewritten_partitions": rewritten,
        "expired_snapshots": expired,
        "pinning_branches": table.branches(),
    }
