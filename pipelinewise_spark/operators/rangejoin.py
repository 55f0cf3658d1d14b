"""Range (interval) join — points matched to intervals without a
nested-loop.

A naive ``points JOIN intervals ON start <= t AND t <= end`` lowers to a
BroadcastNestedLoopJoin — quadratic, dead at scale. The scalable shape is
bucketing: a point lives in exactly one time bucket of width W; an interval
is exploded to every bucket it overlaps. Equi-joining on (keys…, bucket)
then applying the exact range predicate finds every match — and each
(point, interval) pair meets in exactly ONE bucket (the point's), so no
dedupe pass is needed. Shuffle volume = |points| + Σ interval spans/W;
choose W near the typical interval length so intervals explode to O(1)
buckets each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket_width: int = 60_000_000,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start <= point <= end`` (and equal ``by`` keys), via bucketed overlap.
    Time columns are integers (e.g. epoch micros); ``bucket_width`` in the
    same unit."""
    by = list(by)
    w = F.lit(bucket_width)
    pb = points.withColumn("__b", (F.col(point_col) / w).cast("long"))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (F.col(start_col) / w).cast("long"),
                (F.col(end_col) / w).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, by + ["__b"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__b")
    )
