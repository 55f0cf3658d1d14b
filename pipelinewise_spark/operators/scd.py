"""Slowly-changing-dimension Type 2 maintenance (versioned history).

The reference keeps ONE row per PK and marks removal with
``_sdc_deleted_at`` (hard/soft delete,
/root/reference/singer-connectors/target-snowflake/target_snowflake/db_sync.py:632-637);
warehouse users who need attribute HISTORY layer SCD2 on top of exactly
this change feed. This module is that layer, Spark-first.

Model — (current slice, append-only closed log):

- the *current* table holds exactly one open version per live PK
  (``_valid_to`` NULL, ``_is_current`` true);
- superseded/deleted versions move to a *closed* log that is APPEND-ONLY:
  closed history is immutable by construction, so at 100 TB the per-batch
  write cost is O(current-slice merge + newly-closed rows) and the years
  of cold history are never rescanned or rewritten. (Storing both in one
  table partitioned by ``_is_current`` gives the same property only with
  a partition-swap publish; the two-table form gets it for free.)

Plan shape of :func:`scd2_apply`: ONE full-outer PK join of the current
slice with the (PK-unique) batch — the same physical shape as
:func:`pipelinewise_spark.operators.merge.merge_upsert` — then each
joined row emits 0-2 output rows (carried / closed / new version) through
an array + ``explode``: no second scan, no window. Broadcast the batch
side when it is small; AQE handles skewed PKs.

Idempotence contract: a re-asserted row with unchanged tracked attributes
is a NO-OP (checksum comparison — the standard SCD2 rule), and a batch
row whose effective timestamp is not strictly newer than the open
version's ``_valid_from`` never supersedes, so replaying a batch cannot
mint duplicate versions or regress history. Batches must be PK-unique
(run :func:`pipelinewise_spark.operators.dedupe.last_wins_dedupe` first
— the same pre-step every MERGE path in this repo uses).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinewise_spark.operators.sdc import SDC_DELETED_AT

VALID_FROM = "_valid_from"
VALID_TO = "_valid_to"
IS_CURRENT = "_is_current"

_T_MARK = "__scd_t_present"
_S_MARK = "__scd_s_present"


def scd2_init(
    batch: DataFrame,
    effective_col: str,
    deleted_col: str = SDC_DELETED_AT,
) -> DataFrame:
    """Initial load: every non-tombstone batch row becomes an open
    version effective at its own ``effective_col`` timestamp."""
    out = batch
    if deleted_col in batch.columns:
        out = out.filter(F.col(deleted_col).isNull()).drop(deleted_col)
    return (
        out.withColumn(VALID_FROM, F.col(effective_col))
        .withColumn(VALID_TO, F.lit(None).cast(out.schema[effective_col].dataType))
        .withColumn(IS_CURRENT, F.lit(True))
    )


def scd2_apply(
    current: DataFrame,
    batch: DataFrame,
    primary_keys: Sequence[str],
    effective_col: str,
    tracked_cols: Sequence[str] | None = None,
    deleted_col: str = SDC_DELETED_AT,
) -> DataFrame:
    """Fold one PK-unique change batch into the current slice.

    Returns the union of the NEW current slice (``_is_current`` true) and
    the rows this batch closed (``_is_current`` false, ``_valid_to`` =
    the batch row's effective timestamp). The caller overwrites the
    current table with the true rows and APPENDS the false rows to the
    closed log — one pass; persist the result (or write it partitioned by
    ``_is_current``) so the split doesn't re-run the join.

    ``tracked_cols`` limits the change checksum to a column subset
    (untracked columns still take the batch's value when a new version is
    minted — SCD2's mixed type-1/type-2 form); default is every shared
    non-PK, non-bookkeeping column.
    """
    pk = list(primary_keys)
    if not pk:
        raise ValueError("scd2_apply requires primary keys")
    meta = {VALID_FROM, VALID_TO, IS_CURRENT, effective_col, deleted_col}
    if tracked_cols is None:
        tracked_cols = [
            c
            for c in batch.columns
            if c in current.columns and c not in pk and c not in meta
        ]
    tracked = list(tracked_cols)
    attrs = [
        c for c in current.columns
        if c not in pk and c not in {VALID_FROM, VALID_TO, IS_CURRENT}
    ]
    ts_type = batch.schema[effective_col].dataType

    t = current.withColumn(_T_MARK, F.lit(True)).alias("t")
    s = batch.withColumn(_S_MARK, F.lit(True)).alias("s")
    joined = t.join(s, on=pk, how="full_outer")

    t_here = F.col(f"t.{_T_MARK}").isNotNull()
    s_here = F.col(f"s.{_S_MARK}").isNotNull()
    tomb = (
        F.col(f"s.{deleted_col}").isNotNull()
        if deleted_col in batch.columns
        else F.lit(False)
    )
    eff = F.col(f"s.{effective_col}")
    changed = ~F.struct(
        *[F.col(f"t.{c}") for c in tracked]
    ).eqNullSafe(F.struct(*[F.col(f"s.{c}") for c in tracked]))
    # strict-newer guard: replayed/stale batch rows can never re-close or
    # re-version an open row (equal re-assertions are no-ops regardless)
    supersede = (
        t_here & s_here & (eff > F.col(f"t.{VALID_FROM}")) & (tomb | changed)
    )
    insert = (s_here & ~t_here & ~tomb) | (supersede & ~tomb)

    def _v(c: str) -> F.Column:
        # batch value where the batch carries the column, else NULL of the
        # current side's type (schema evolution parity with merge_upsert)
        if c in batch.columns:
            return F.col(f"s.{c}")
        return F.lit(None).cast(current.schema[c].dataType)

    out_struct = lambda vals: F.struct(  # noqa: E731
        *[v.alias(c) for c, v in vals]
    )
    carried = out_struct(
        [(c, F.col(f"t.{c}")) for c in attrs]
        + [
            (VALID_FROM, F.col(f"t.{VALID_FROM}")),
            (VALID_TO, F.lit(None).cast(ts_type)),
            (IS_CURRENT, F.lit(True)),
        ]
    )
    closed = out_struct(
        [(c, F.col(f"t.{c}")) for c in attrs]
        + [
            (VALID_FROM, F.col(f"t.{VALID_FROM}")),
            (VALID_TO, eff),
            (IS_CURRENT, F.lit(False)),
        ]
    )
    opened = out_struct(
        [(c, _v(c)) for c in attrs]
        + [
            (VALID_FROM, eff),
            (VALID_TO, F.lit(None).cast(ts_type)),
            (IS_CURRENT, F.lit(True)),
        ]
    )
    emitted = F.array_compact(
        F.array(
            F.when(t_here & ~supersede, carried),
            F.when(supersede, closed),
            F.when(insert, opened),
        )
    )
    row = F.explode(emitted).alias("__row")
    return joined.select(*pk, row).select(
        *pk, *[F.col(f"__row.{c}").alias(c) for c in attrs],
        F.col(f"__row.{VALID_FROM}").alias(VALID_FROM),
        F.col(f"__row.{VALID_TO}").alias(VALID_TO),
        F.col(f"__row.{IS_CURRENT}").alias(IS_CURRENT),
    )


def scd2_snapshot(history: DataFrame, ts) -> DataFrame:
    """Dimension state as of ``ts``: the version whose validity interval
    covers the instant. Works on the current slice ∪ closed log (or any
    union of SCD2 rows); intervals are half-open ``[from, to)``."""
    t = F.lit(ts)
    return history.filter(
        (F.col(VALID_FROM) <= t)
        & (F.col(VALID_TO).isNull() | (t < F.col(VALID_TO)))
    ).drop(IS_CURRENT)


def scd2_pit_join(
    facts: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    fact_ts_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version that
    was valid at the fact's own timestamp — an equi-join on the dimension
    key plus the interval predicate, so Catalyst plans a hash join with a
    post-filter (broadcast for the usual dim≪fact case: the fact side
    never shuffles). Facts with no valid version at their instant are
    kept with NULL dimension columns (left join)."""
    k = list(keys)
    dim = history.drop(IS_CURRENT)
    if broadcast_dim:
        dim = F.broadcast(dim)
    cond = (
        (F.col(VALID_FROM) <= F.col(fact_ts_col))
        & (F.col(VALID_TO).isNull() | (F.col(fact_ts_col) < F.col(VALID_TO)))
    )
    for c in k:
        cond = cond & facts[c].eqNullSafe(dim[c])
    joined = facts.join(dim, on=cond, how="left")
    return joined.select(
        *[facts[c] for c in facts.columns],
        *[
            dim[c]
            for c in dim.columns
            if c not in k and c not in (VALID_FROM, VALID_TO)
        ],
    )
