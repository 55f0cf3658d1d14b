"""Schema evolution: add-column and version-column (rename on type change).

Reference behavior on each flush (target_snowflake/db_sync.py:767-841
``update_columns``, :849-870 ``version_column``/``add_column``):

- column in the batch but not in the target          → ADD COLUMN
- column in both but with an incompatible new type   → rename the existing
  column to ``<name>_<YYYYMMDD_HHMI>`` (data retained) and ADD a fresh column
  with the new type
- column in the target but not in the batch          → kept, NULL for new rows

Spark shape: pure DataFrame projection — the parquet-snapshot table rewrites
its pointer anyway, so "DDL" is just producing the evolved projection of the
old snapshot and merging. On Delta/Iceberg the same decisions drive real
``ALTER TABLE`` statements; the decision function is engine-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class EvolutionAction:
    kind: str  # "add_column" | "version_column"
    column: str
    new_type: str | None = None
    versioned_name: str | None = None


def _compatible(old: T.DataType, new: T.DataType) -> bool:
    """Types the reference treats as same-column (no versioning).

    The reference versions on any mapped-DDL-type change except the
    TIMESTAMP_NTZ special case (db_sync.py:782-800: ``trino-compatible``
    timestamp variants collapse). We collapse exact matches and
    widening-safe numeric pairs.
    """
    if old == new:
        return True
    numeric_order = [
        T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(),
    ]
    if old in numeric_order and new in numeric_order:
        return numeric_order.index(new) >= numeric_order.index(old)
    # timestamp flavors collapse (TIMESTAMP_NTZ exception)
    ts = (T.TimestampType(), T.TimestampNTZType())
    return old in ts and new in ts


def plan_evolution(
    target_schema: T.StructType,
    batch_schema: T.StructType,
    version_suffix: str | None = None,
) -> list[EvolutionAction]:
    """Decide evolution actions (pure; unit-testable without Spark)."""
    if version_suffix is None:
        version_suffix = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M")
    target_fields = {f.name.lower(): f for f in target_schema.fields}
    actions: list[EvolutionAction] = []
    for f in batch_schema.fields:
        existing = target_fields.get(f.name.lower())
        if existing is None:
            actions.append(
                EvolutionAction("add_column", f.name, new_type=f.dataType.simpleString())
            )
        elif not _compatible(existing.dataType, f.dataType):
            actions.append(
                EvolutionAction(
                    "version_column",
                    f.name,
                    new_type=f.dataType.simpleString(),
                    versioned_name=f"{f.name}_{version_suffix}",
                )
            )
    return actions


def apply_evolution(
    target: DataFrame,
    batch_schema: T.StructType,
    actions: list[EvolutionAction],
) -> DataFrame:
    """Project the existing target into the evolved schema."""
    batch_fields = {f.name.lower(): f for f in batch_schema.fields}
    df = target
    for a in actions:
        if a.kind == "version_column":
            df = df.withColumnRenamed(a.column, a.versioned_name)
            df = df.withColumn(
                a.column,
                F.lit(None).cast(batch_fields[a.column.lower()].dataType),
            )
        elif a.kind == "add_column":
            df = df.withColumn(
                a.column,
                F.lit(None).cast(batch_fields[a.column.lower()].dataType),
            )
    return df


def evolve_target(
    target: DataFrame,
    batch: DataFrame,
    version_suffix: str | None = None,
) -> DataFrame:
    """Convenience: plan + apply against a batch DataFrame's schema."""
    actions = plan_evolution(target.schema, batch.schema, version_suffix)
    return apply_evolution(target, batch.schema, actions)
