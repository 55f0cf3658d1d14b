"""Right-to-be-forgotten: physical erasure across live data AND history.

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

from pyspark.sql import SparkSession


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
