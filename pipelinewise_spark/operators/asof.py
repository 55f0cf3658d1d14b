"""As-of (point-in-time) join — an operator Spark lacks natively.

For every left row, attach the newest right row whose time is <= the left
time, per key. The classic implementations are per-row subqueries or range
self-joins (quadratic); the scalable shape is the MERGE-SORT form: union the
two sides, one window sorted by (time, side) per key, and carry the last
seen right values forward. One shuffle on the key, one sort — exactly what
a 1000-executor cluster wants (and the same plan DuckDB/kdb lower ASOF to).

Oracle twin: DuckDB's native ``ASOF LEFT JOIN`` (tests/queries compare
value-for-value).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    on: str,
) -> DataFrame:
    """Backward as-of left join: ``left`` keeps all columns; every right
    column (other than ``by``/``on``) is attached from the newest right row
    with ``right.on <= left.on`` within the same ``by`` key (NULL when no
    such row). Right value columns must not collide with left columns —
    rename before calling. Rows with NULL ``on`` never match.

    Determinism contract: at most one right row per (by, on); pre-dedupe the
    right side if the time column can tie (both engines pick ties
    arbitrarily otherwise).
    """
    by = list(by)
    rvals = [c for c in right.columns if c not in by and c != on]
    collide = set(rvals) & set(left.columns)
    if collide:
        raise ValueError(f"right value columns collide with left: {sorted(collide)}")

    # side ordering: at equal time, the right row sorts FIRST so it is
    # visible to a left row at the same instant (<= semantics)
    lt = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rvals],
    )
    rt = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != on
        ],
        *[F.col(c) for c in rvals],
    )
    u = lt.unionByName(rt).filter(F.col("__ts").isNotNull())
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in rvals:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out_cols = by + [on] + [
        c for c in left.columns if c not in by and c != on
    ] + rvals
    return (
        u.filter(F.col("__side") == 1)
        .withColumnRenamed("__ts", on)
        .select(*out_cols)
    )
