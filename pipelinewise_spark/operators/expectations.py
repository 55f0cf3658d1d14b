"""Declarative table-quality expectations, evaluated in ONE aggregate pass.

The reference validates row-by-row against JSON-Schema at load time
(this repo's :mod:`pipelinewise_spark.operators.validation`); what it has
no analog for is TABLE-level acceptance — "this batch may load only if
o_orderkey is unique, o_custkey is never null, and the row count didn't
collapse" — the dbt-tests / Great-Expectations layer every production
pipeline bolts on. This module is that layer, Spark-first:

- every rule compiles to aggregate expressions over the SAME single
  ``df.agg(...)`` — one scan, one (1-row) reduce, no per-rule jobs, no
  shuffle beyond the aggregate's partial/final combine;
- the report is a DataFrame (rule, column, metric, threshold, passed)
  unpivoted from that one row via ``stack`` — answer-sized, never a
  driver-side loop over data;
- :func:`enforce` raises with the failing rules; together with
  ``ManifestTable`` branches this gives write-audit-publish (stage the
  batch on a branch, run the report against the STAGED snapshot, fast-
  forward only when green — see :func:`write_audit_publish`).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``metric(df) >= threshold`` (metrics are oriented
    so bigger is always better; ratios live in [0,1]). ``prepare``, when
    set, decorates the frame with indicator columns the metric needs
    (e.g. a broadcast dim-membership marker for FK rules) — all
    prepares chain BEFORE the single aggregate, so the evaluation stays
    one scan + K broadcast joins, never K scans."""

    name: str
    column: str
    metric: Callable[[], F.Column]
    threshold: float
    prepare: Callable[[DataFrame], DataFrame] | None = None


def _ratio(cond: F.Column) -> F.Column:
    # avg over an exact 0/1 indicator: identical IEEE division of exact
    # ints in any engine; empty input -> NULL, handled as failure
    return F.avg(cond.cast("double"))


def not_null(col: str, min_ratio: float = 1.0) -> Rule:
    return Rule(
        "not_null", col,
        lambda: _ratio(F.col(col).isNotNull()), min_ratio,
    )


def unique(*cols: str, min_ratio: float = 1.0) -> Rule:
    """Distinct-key ratio: 1.0 ⇔ the column set is a key."""
    return Rule(
        "unique", ",".join(cols),
        lambda: F.count_distinct(F.struct(*cols)).cast("double")
        / F.count(F.lit(1)).cast("double"),
        min_ratio,
    )


def accepted_values(
    col: str, values: Sequence, min_ratio: float = 1.0
) -> Rule:
    vals = list(values)
    return Rule(
        "accepted_values", col,
        lambda: _ratio(F.col(col).isin(vals)), min_ratio,
    )


def in_range(col: str, lo, hi, min_ratio: float = 1.0) -> Rule:
    return Rule(
        "in_range", col,
        lambda: _ratio(F.col(col).between(F.lit(lo), F.lit(hi))),
        min_ratio,
    )


def row_count_at_least(n: int) -> Rule:
    return Rule(
        "row_count_at_least", "*",
        lambda: F.count(F.lit(1)).cast("double"), float(n),
    )


def satisfies(name: str, predicate: F.Column, min_ratio: float = 1.0) -> Rule:
    """Escape hatch: fraction of rows satisfying an arbitrary Column
    predicate (NULL predicate counts as not satisfied)."""
    return Rule(
        name, "*",
        lambda: _ratio(F.coalesce(predicate, F.lit(False))), min_ratio,
    )


def references(
    col: str,
    dim: DataFrame,
    dim_col: str,
    min_ratio: float = 1.0,
) -> Rule:
    """dbt's ``relationships`` test: fraction of NON-NULL ``col`` values
    that resolve in ``dim.dim_col`` (orphan FKs fail). The dim key set
    broadcasts — dimension keys are answer-sized next to a fact batch."""
    marker = f"__ref_{col}"

    def prep(df: DataFrame) -> DataFrame:
        keys = (
            dim.select(F.col(dim_col).alias(col))
            .distinct()
            .withColumn(marker, F.lit(True))
        )
        return df.join(F.broadcast(keys), col, "left")

    return Rule(
        "references", col,
        lambda: F.avg(
            F.when(
                F.col(col).isNotNull(),
                F.col(marker).isNotNull().cast("double"),
            )
        ),
        min_ratio,
        prepare=prep,
    )


def _null_safe_class_join(
    df: DataFrame, classes: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Join a per-quasi-class marker frame back onto ``df`` with
    NULL-SAFE equality on every quasi column (groupBy already groups
    NULLs into one class; a plain equi-join back would drop exactly
    those rows). The class columns are aliased on the right side so
    the joined frame keeps ``df``'s original columns unambiguous."""
    right = classes.select(
        *[F.col(c).alias(f"__cls_{c}") for c in cols],
        *[F.col(c) for c in classes.columns if c not in cols],
    )
    cond = None
    for c in cols:
        term = F.col(c).eqNullSafe(F.col(f"__cls_{c}"))
        cond = term if cond is None else (cond & term)
    return df.join(F.broadcast(right), cond, "left").drop(
        *[f"__cls_{c}" for c in cols]
    )


def k_anonymous(
    quasi_cols: Sequence[str], k: int = 5, min_ratio: float = 1.0
) -> Rule:
    """Privacy expectation: fraction of rows living in quasi-identifier
    equivalence classes of size ≥ ``k`` (operators/compliance.py measures
    this as a report; this Rule form wires it into the SAME
    write-audit-publish gate that refuses FK violations — a release
    whose re-identification risk exceeds the bound never publishes).

    ``min_ratio=1.0`` demands full k-anonymity; a tolerance is a
    max-at-risk-ppm bound expressed as ``1 − ppm/1e6``. ``prepare``
    joins the class-size frame back on the quasi tuple (broadcast —
    classes are answer-sized, bounded by the quasi-domain product; for
    a pathological high-cardinality quasi tuple drop to compliance.py's
    report instead, where the groupBy IS the answer).

    NULL quasi values form a measurable class like any other: the
    class join is NULL-SAFE (``eqNullSafe`` per quasi column), so a
    release whose only sub-k class is the all-NULL-quasi group still
    fails the gate instead of silently passing (a plain equi-join
    would never match the null-keyed rows, leaving their marker NULL
    and dropping them from the ratio entirely — fail-open)."""
    cols = list(quasi_cols)
    marker = "__kanon_" + "_".join(cols)

    def prep(df: DataFrame) -> DataFrame:
        classes = df.groupBy(*cols).agg(
            F.count(F.lit(1)).alias(marker)
        )
        return _null_safe_class_join(df, classes, cols)

    return Rule(
        "k_anonymous", ",".join(cols),
        lambda: _ratio(F.col(marker) >= F.lit(int(k))), min_ratio,
        prepare=prep,
    )


def l_diverse(
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_min: int = 2,
    min_ratio: float = 1.0,
) -> Rule:
    """Privacy expectation: fraction of rows whose quasi-identifier
    class carries ≥ ``l_min`` distinct ``sensitive_col`` values — the
    attribute-disclosure guard k-anonymity alone misses (a class can be
    k-anonymous yet leak its attribute when every member shares one
    sensitive value). Same NULL-SAFE broadcast class-join shape as
    :func:`k_anonymous` (NULL quasi classes are measured, not
    silently skipped)."""
    cols = list(quasi_cols)
    marker = f"__ldiv_{sensitive_col}_" + "_".join(cols)

    def prep(df: DataFrame) -> DataFrame:
        classes = df.groupBy(*cols).agg(
            F.count_distinct(F.col(sensitive_col)).alias(marker)
        )
        return _null_safe_class_join(df, classes, cols)

    return Rule(
        "l_diverse", ",".join(cols),
        lambda: _ratio(F.col(marker) >= F.lit(int(l_min))), min_ratio,
        prepare=prep,
    )


def expectations_report(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """(rule, column, metric, threshold, passed) — one row per rule, all
    metrics from a single aggregate pass over ``df``. A NULL metric
    (empty input) fails closed."""
    if not rules:
        raise ValueError("no expectations given")
    for r in rules:
        if r.prepare is not None:
            df = r.prepare(df)
    aggs = [r.metric().alias(f"__m_{i}") for i, r in enumerate(rules)]
    one = df.agg(*aggs)
    stack_args: list[F.Column] = []
    for i, r in enumerate(rules):
        stack_args += [
            F.lit(r.name),
            F.lit(r.column),
            F.col(f"__m_{i}"),
            F.lit(float(r.threshold)),
        ]
    return one.select(
        F.stack(
            F.lit(len(rules)), *stack_args
        ).alias("rule", "column", "metric", "threshold")
    ).select(
        "rule", "column", "metric", "threshold",
        F.coalesce(
            F.col("metric") >= F.col("threshold"), F.lit(False)
        ).alias("passed"),
    )


class ExpectationError(RuntimeError):
    def __init__(self, failures: list[dict]):
        self.failures = failures
        super().__init__(
            "expectations failed: "
            + "; ".join(
                f"{f['rule']}({f['column']}) metric={f['metric']} "
                f"< {f['threshold']}"
                for f in failures
            )
        )


def enforce(df: DataFrame, rules: Sequence[Rule]) -> list[dict]:
    """Evaluate and raise :class:`ExpectationError` on any failure;
    returns the full report rows (answer-sized) when green."""
    rows = [r.asDict() for r in expectations_report(df, rules).collect()]
    bad = [r for r in rows if not r["passed"]]
    if bad:
        raise ExpectationError(bad)
    return rows


def write_audit_publish(
    spark: SparkSession,
    table,
    rules: Sequence[Rule],
    write: Callable[[object], None],
    branch: str = "wap-audit",
) -> tuple[bool, list[dict]]:
    """Iceberg-style WAP: stage ``write(branch_handle)`` on a branch of
    ``table`` (a :class:`ManifestTable`), audit the STAGED snapshot with
    ``rules``, and fast-forward main only when every rule passes. On
    failure the ref is dropped — main's readers never observe the staged
    bytes, and vacuum collects them later. Returns (published, report).

    The audit reads through the branch handle, so it sees exactly the
    post-write state main would adopt — deletion vectors, constraints
    and stats included. Cost: the write itself + one aggregate pass."""
    br = table.create_branch(branch)
    try:
        write(br)
        report = [
            r.asDict()
            for r in expectations_report(br.read(spark), rules).collect()
        ]
        ok = all(r["passed"] for r in report)
        if ok:
            table.fast_forward(branch)
        return ok, report
    finally:
        table.drop_branch(branch)
