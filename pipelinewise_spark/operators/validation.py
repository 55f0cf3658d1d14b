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
    kind: str  # not_null | in_set | between | matches | ge | le | gt | lt
    #          | min_length | max_length | multiple_of
    args: tuple[Any, ...] = ()

    @property
    def name(self) -> str:
        return f"{self.column}:{self.kind}"

    def predicate(self) -> Column:
        """NULL semantics: every kind except ``not_null`` passes NULL —
        presence is exclusively ``not_null``'s job (Draft-7: a value
        keyword applies only when the instance has the keyword's type;
        SQL three-valued logic agrees)."""
        c = F.col(self.column)
        if self.kind == "not_null":
            return c.isNotNull()
        if self.kind == "in_set":
            return c.isNull() | c.isin(list(self.args))
        if self.kind == "between":
            lo, hi = self.args
            return c.isNull() | c.between(F.lit(lo), F.lit(hi))
        if self.kind == "matches":
            (pat,) = self.args
            return c.isNull() | c.cast("string").rlike(pat)
        if self.kind in ("ge", "le", "gt", "lt"):
            (bound,) = self.args
            op = {
                "ge": c >= F.lit(bound), "le": c <= F.lit(bound),
                "gt": c > F.lit(bound), "lt": c < F.lit(bound),
            }[self.kind]
            return c.isNull() | op
        if self.kind == "min_length":
            (n,) = self.args
            return c.isNull() | (F.length(c.cast("string")) >= n)
        if self.kind == "max_length":
            (n,) = self.args
            return c.isNull() | (F.length(c.cast("string")) <= n)
        if self.kind == "multiple_of":
            (m,) = self.args
            # decimal arithmetic, like the reference's float_to_decimal +
            # jsonschema multipleOf check (exact, no float remainder noise)
            dec = "decimal(38,9)"
            return c.isNull() | (
                F.pmod(c.cast(dec), F.lit(m).cast(dec)) == 0
            )
        raise ValueError(f"unknown constraint kind {self.kind!r}")


def compile_json_schema(schema: dict[str, Any]) -> list[Constraint]:
    """Compile a JSON-Schema (Draft-7) document into Constraints — closing
    the loop the reference closes with the ``jsonschema`` library
    (target_snowflake/__init__.py:148-158 builds a Draft7Validator per stream
    and validates each record; `validate_records` config flag).

    Supported keywords per property: ``required`` (+ non-null ``type``) →
    not_null; ``enum`` → in_set; ``pattern`` → matches; ``minimum`` /
    ``maximum`` (and exclusive variants) → between/ge/le/gt/lt;
    ``minLength`` / ``maxLength`` → length bounds; ``multipleOf`` →
    decimal-exact modulo. Structural keywords (``type`` itself,
    ``properties`` nesting) are enforced by the DataFrame schema, not here.

    Parity quirk kept: like the reference (which raises
    InvalidValidationOperationException for multipleOf precisions the
    decimal context can't hold), multipleOf values with >= 15 significant
    digits are rejected up front.
    """
    cons: list[Constraint] = []
    required = set(schema.get("required") or [])
    for name, prop in (schema.get("properties") or {}).items():
        t = prop.get("type", [])
        types = [t] if isinstance(t, str) else list(t)
        if name in required and types and "null" not in types:
            cons.append(Constraint(name, "not_null"))
        if "enum" in prop:
            cons.append(Constraint(name, "in_set", tuple(prop["enum"])))
        if "pattern" in prop:
            cons.append(Constraint(name, "matches", (prop["pattern"],)))
        lo = prop.get("minimum")
        hi = prop.get("maximum")
        if lo is not None and hi is not None:
            cons.append(Constraint(name, "between", (lo, hi)))
        elif lo is not None:
            cons.append(Constraint(name, "ge", (lo,)))
        elif hi is not None:
            cons.append(Constraint(name, "le", (hi,)))
        if prop.get("exclusiveMinimum") is not None:
            cons.append(Constraint(name, "gt", (prop["exclusiveMinimum"],)))
        if prop.get("exclusiveMaximum") is not None:
            cons.append(Constraint(name, "lt", (prop["exclusiveMaximum"],)))
        if prop.get("minLength") is not None:
            cons.append(Constraint(name, "min_length", (prop["minLength"],)))
        if prop.get("maxLength") is not None:
            cons.append(Constraint(name, "max_length", (prop["maxLength"],)))
        if prop.get("multipleOf") is not None:
            m = prop["multipleOf"]
            digits = len(str(m).replace(".", "").replace("-", "").lstrip("0"))
            if digits >= 15:
                raise ValueError(
                    "multipleOf validations that allow long precisions are "
                    "not supported (15+ significant digits) — same contract "
                    "as the reference's InvalidValidationOperationException"
                )
            cons.append(Constraint(name, "multiple_of", (m,)))
    return cons


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


def quarantine_split(
    df: DataFrame, constraints: list[Constraint]
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter routing: (valid, quarantine). Valid rows drop the audit
    columns and continue to the target; invalid rows carry ``violations``
    plus the full original payload JSON-serialized as ``_dlq_record`` —
    replayable after the schema/source is fixed, the operational upgrade
    over the reference's validate-and-raise
    (target_snowflake/__init__.py:148-158 aborts the whole load on the
    first bad record). Both sides are one filter over the same validated
    projection — the input is scanned once per consumed side, no shuffle."""
    checked = validate(df, constraints)
    valid = checked.filter(F.col("is_valid")).drop("violations", "is_valid")
    quarantine = checked.filter(~F.col("is_valid")).select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias(
            "_dlq_record"
        ),
        "violations",
    )
    return valid, quarantine
