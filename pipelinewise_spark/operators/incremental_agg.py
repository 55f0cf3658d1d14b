"""Incremental aggregate maintenance — materialized rollups kept current
from a change feed, never re-reading the base table.

The reference keeps no derived tables (every number is recomputed by the
warehouse); at 100 TB a rollup that downstream dashboards hit constantly
must be maintained incrementally: a 0.1 % change batch should cost work
proportional to the BATCH, not the base table. For additive measures
(count, sum — avg derives as sum/count) the algebra is exact:

    delta(group) = sum(inserted values) - sum(deleted values)

An update is a delete of the old row plus an insert of the new row, which
also handles rows that MOVE between groups. The physical plan is one narrow
projection of the change feed into +/- contributions, one shuffle on the
group key (cardinality = number of touched groups, tiny), and one
outer-merge join onto the materialized aggregate — broadcast-able whenever
the touched-group set is small. The base table is never scanned.

Non-additive measures (min/max under deletes) are handled by the rescope
path: recompute ONLY the touched groups from the base table (partition /
manifest pruning makes that a sliver of the data) and patch them in.

This is the DBSP/"DBToaster"-style view-maintenance delta rule expressed as
a Spark plan; the change feed shape matches the engine's own snapshot diff
(queries/ops.py:snapshot_diff_orders) and CDC contract (streaming/cdc.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = ("i", "u", "d")


def build_aggregate(
    base: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Full (initial) build of the maintained aggregate: per ``keys`` group,
    ``count_col`` = row count and one summed column per ``sums`` entry
    (output name -> source column). Sum inputs are widened to decimal so the
    maintained totals stay exact under +/- replay (FP addition is not
    associative; decimal is)."""
    aggs = [F.count(F.lit(1)).alias(count_col)] + [
        F.sum(F.col(src).cast("decimal(28,6)")).alias(out)
        for out, src in sums.items()
    ]
    return base.groupBy(*keys).agg(*aggs)


def change_feed_deltas(
    changes: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, str],
    count_col: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Per-group deltas from a change feed.

    ``changes`` carries ``op`` in {'i','u','d'} plus ``old_<col>`` /
    ``new_<col>`` for every group key and summed source column (old_* NULL
    for inserts, new_* NULL for deletes). Each row contributes a negative
    term at its old group and a positive term at its new group; groupBy
    collapses them into one delta row per touched group.
    """
    neg = (
        changes.filter(F.col(op_col).isin("u", "d"))
        .select(
            *[F.col(f"old_{k}").alias(k) for k in keys],
            F.lit(-1).cast("bigint").alias(count_col),
            *[
                (-F.coalesce(F.col(f"old_{src}").cast("decimal(28,6)"),
                             F.lit(0).cast("decimal(28,6)"))).alias(out)
                for out, src in sums.items()
            ],
        )
    )
    pos = (
        changes.filter(F.col(op_col).isin("i", "u"))
        .select(
            *[F.col(f"new_{k}").alias(k) for k in keys],
            F.lit(1).cast("bigint").alias(count_col),
            *[
                F.coalesce(F.col(f"new_{src}").cast("decimal(28,6)"),
                           F.lit(0).cast("decimal(28,6)")).alias(out)
                for out, src in sums.items()
            ],
        )
    )
    return (
        neg.unionByName(pos)
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(out).alias(out) for out in sums],
        )
    )


def apply_change_feed(
    mv: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, str],
    count_col: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Merge change-feed deltas into the maintained aggregate and return the
    new aggregate contents (caller publishes atomically, same contract as
    merge_upsert). Groups whose maintained count reaches zero disappear —
    exactly what a recompute would produce."""
    deltas = change_feed_deltas(changes, keys, sums, count_col, op_col)
    on = [mv[k].eqNullSafe(deltas[k]) for k in keys]
    j = mv.alias("m").join(deltas.alias("d"), on, "full_outer")
    out = j.select(
        *[
            F.coalesce(F.col(f"m.{k}"), F.col(f"d.{k}")).alias(k)
            for k in keys
        ],
        (
            F.coalesce(F.col(f"m.{count_col}"), F.lit(0))
            + F.coalesce(F.col(f"d.{count_col}"), F.lit(0))
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(f"m.{out_c}"), F.lit(0).cast("decimal(28,6)"))
                + F.coalesce(F.col(f"d.{out_c}"), F.lit(0).cast("decimal(28,6)"))
            ).alias(out_c)
            for out_c in sums
        ],
    )
    return out.filter(F.col(count_col) > 0)


def rescope_groups(
    mv: DataFrame,
    base: DataFrame,
    touched: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    count_col: str = "n_rows",
) -> DataFrame:
    """Non-additive path (min/max/distinct under deletes): recompute ONLY
    the groups listed in ``touched`` from ``base`` (which the caller should
    already have pruned to those groups — partition pruning / manifest
    ranges make this cheap) and splice them over the stale rows. ``aggs``
    maps output name -> (source column, fn) with fn in {min,max,sum,count}.
    """
    exprs = [F.count(F.lit(1)).alias(count_col)] + [
        getattr(F, fn)(src).alias(out) for out, (src, fn) in aggs.items()
    ]
    fresh = (
        base.join(F.broadcast(touched.select(*keys).distinct()), list(keys), "inner")
        .groupBy(*keys)
        .agg(*exprs)
    )
    kept = mv.join(
        F.broadcast(touched.select(*keys).distinct()), list(keys), "left_anti"
    )
    return kept.unionByName(fresh)
