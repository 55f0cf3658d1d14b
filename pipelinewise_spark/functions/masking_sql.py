"""SQL-pushdown masking — the reference's second transform implementation.

The reference maintains the mask semantics twice: row-at-a-time Python for
the Singer stream (transform.py) and generated SQL for FastSync pushdown into
the warehouse (/root/reference/pipelinewise/fastsync/commons/transform_utils.py:
242-390 value SQL, :148-222 condition SQL). This module is the engine's
equivalent emitter: compile a transformation list into ANSI-SQL expressions
so masking can run inside a source/target database (JDBC subquery decoration,
warehouse UPDATEs) instead of in Spark.

Used with JdbcSource.safe_select: masked columns never leave the source
unmasked — the PII boundary the FastSync path guarantees.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from typing import Any

from pipelinewise_spark.plans.spec import TransformationSpec

_SKIP_FIRST = re.compile(r"^HASH-SKIP-FIRST-(\d)$")
_SKIP_ENDS = re.compile(r"^MASK-STRING-SKIP-ENDS-(\d)$")


def _q(ident: str) -> str:
    return ident  # hook for dialect quoting


def mask_sql(column: str, transform_type: str) -> str:
    """ANSI-SQL expression computing the masked value of ``column``."""
    t = transform_type.upper()
    c = _q(column)
    if t == "SET-NULL":
        return "NULL"
    if t == "HASH":
        return f"sha256(CAST({c} AS VARCHAR))"
    m = _SKIP_FIRST.match(t)
    if m:
        n = int(m.group(1))
        return (
            f"substr(CAST({c} AS VARCHAR), 1, {n}) || "
            f"sha256(substr(CAST({c} AS VARCHAR), {n + 1}))"
        )
    if t == "MASK-DATE":
        return (
            f"make_timestamp(year({c}), 1, 1, hour({c}), minute({c}), "
            f"CAST(strftime({c}, '%S.%f') AS DOUBLE))"
        )
    if t == "MASK-NUMBER":
        return "0"
    if t == "MASK-HIDDEN":
        return "'hidden'"
    m = _SKIP_ENDS.match(t)
    if m:
        n = int(m.group(1))
        v = f"CAST({c} AS VARCHAR)"
        return (
            f"CASE WHEN length({v}) > {2 * n} THEN "
            f"substr({v}, 1, {n}) || repeat('*', length({v}) - {2 * n}) || "
            f"substr({v}, length({v}) - {n - 1}, {n}) "
            f"ELSE repeat('*', length({v})) END"
        )
    raise ValueError(f"unknown transformation type: {transform_type}")


def condition_sql(when: Sequence[dict[str, Any]]) -> str | None:
    """AND-ed condition list → SQL boolean expression (None = unconditional).
    Mirrors transform_utils.py:148-222."""
    if not when:
        return None
    parts = []
    for cond in when:
        col = _q(cond["column"])
        if cond.get("field_path"):
            col = (
                f"json_extract_string(CAST({col} AS VARCHAR), "
                f"'$.{cond['field_path'].replace('/', '.')}')"
            )
        if "equals" in cond:
            v = cond["equals"]
            if v is None:
                parts.append(f"{col} IS NULL")
            elif isinstance(v, str):
                if v == "":
                    parts.append(f"({col} IS NULL OR CAST({col} AS VARCHAR) = '')")
                else:
                    parts.append(f"{col} = '" + v.replace("'", "''") + "'")
            elif isinstance(v, bool):  # before int: bool is an int subclass
                parts.append(f"{col} = {'TRUE' if v else 'FALSE'}")
            elif isinstance(v, (int, float)):
                parts.append(f"{col} = {v!r}")
            else:
                raise ValueError(f"unsupported equals literal: {v!r}")
        elif "regex_match" in cond:
            pat = cond["regex_match"].replace("'", "''")
            parts.append(f"regexp_matches(CAST({col} AS VARCHAR), '{pat}')")
        else:
            raise ValueError(f"unsupported condition: {cond}")
    return " AND ".join(parts)


def transformation_sql(
    t: TransformationSpec | dict[str, Any], input_expr: str | None = None
) -> str:
    """Full SELECT-list expression for one transformation (conditional masks
    keep the original value when the condition fails).

    ``input_expr`` is the expression standing in for the column — used when
    stacking multiple rules on one column so each rule masks the previous
    rule's output (matching apply_transformations' sequential withColumn
    semantics, where later conditions on the same column see masked values).
    """
    if isinstance(t, dict):
        t = TransformationSpec(
            field_id=t["field_id"],
            type=t["type"],
            when=t.get("when", []) or [],
            field_paths=t.get("field_paths", []) or [],
        )
    if t.field_paths:
        raise ValueError(
            "field_paths masking is not SQL-pushdownable; use the Arrow path"
        )
    src = f"({input_expr})" if input_expr is not None else t.field_id
    masked = mask_sql(src, t.type)
    # conditions on the masked column itself also see the stacked input
    when = [
        {**c, "column": src} if c.get("column") == t.field_id and input_expr
        else c
        for c in t.when
    ]
    cond = condition_sql(when)
    if cond is None:
        return masked
    orig = _q(src)
    if t.type.upper() in ("HASH", "MASK-HIDDEN") or _SKIP_FIRST.match(
        t.type.upper()
    ) or _SKIP_ENDS.match(t.type.upper()):
        orig = f"CAST({orig} AS VARCHAR)"
    return f"CASE WHEN {cond} THEN {masked} ELSE {orig} END"


def masked_select_list(
    columns: Sequence[str],
    transformations: Sequence[TransformationSpec | dict[str, Any]],
) -> list[tuple[str, str]]:
    """(name, expr) pairs for JdbcSource.safe_select — untransformed columns
    pass through untouched; stacked rules on one column nest in order."""
    by_field: dict[str, list[Any]] = {}
    for t in transformations:
        fid = t["field_id"] if isinstance(t, dict) else t.field_id
        by_field.setdefault(fid, []).append(t)
    out = []
    for c in columns:
        if c in by_field:
            expr: str | None = None
            for t in by_field[c]:
                expr = transformation_sql(t, input_expr=expr)
            out.append((c, expr))
        else:
            out.append((c, c))
    return out
