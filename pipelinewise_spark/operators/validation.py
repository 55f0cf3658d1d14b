"""Record validation — the reference's optional JSON-Schema check, Spark-way.

The reference validates each record against the stream's JSON Schema before
buffering (target_snowflake/__init__.py:148-158, jsonschema Draft-7). On a
DataFrame the schema itself is enforced by construction; what remains are
*constraint* checks (required/non-null, enums, ranges, patterns) evaluated as
Column predicates — vectorized, JVM-side, and reportable per-row instead of
aborting the pipe.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Constraint:
    column: str
    kind: str  # not_null | in_set | between | matches
    args: tuple[Any, ...] = ()

    @property
    def name(self) -> str:
        return f"{self.column}:{self.kind}"

    def predicate(self) -> Column:
        c = F.col(self.column)
        if self.kind == "not_null":
            return c.isNotNull()
        if self.kind == "in_set":
            return c.isin(list(self.args))
        if self.kind == "between":
            lo, hi = self.args
            return c.isNotNull() & c.between(F.lit(lo), F.lit(hi))
        if self.kind == "matches":
            (pat,) = self.args
            return c.isNotNull() & c.cast("string").rlike(pat)
        raise ValueError(f"unknown constraint kind {self.kind!r}")


def validate(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Append ``is_valid`` and ``violations`` (array of failed constraint
    names, in declaration order) — one projection, no shuffle."""
    viols = F.array_compact(
        F.array(
            *[
                F.when(~c.predicate(), F.lit(c.name)).otherwise(
                    F.lit(None).cast("string")
                )
                for c in constraints
            ]
        )
    )
    return df.withColumn("violations", viols).withColumn(
        "is_valid", F.size("violations") == 0
    )
