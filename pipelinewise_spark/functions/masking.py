"""Masking / obfuscation transformations as pure Column expressions.

The reference's transformation operator family — its entire user-facing
scalar-function surface — lives in
/root/reference/singer-connectors/transform-field/transform_field/transform.py
(:147-196 value fns, :12-103 conditions) with an equivalent SQL-pushdown
implementation in /root/reference/pipelinewise/fastsync/commons/transform_utils.py
(:242-390). Semantics implemented here, per type:

    SET-NULL                  → NULL
    HASH                      → sha256 hexdigest of the string value
    HASH-SKIP-FIRST-{1..9}    → first n chars ++ sha256(rest)
    MASK-DATE                 → keep year & time-of-day, month=day=1
    MASK-NUMBER               → 0
    MASK-HIDDEN               → 'hidden'
    MASK-STRING-SKIP-ENDS-{1..9}
                              → keep n chars each end, '*' between;
                                all-'*' when len(value) <= 2n

Conditions (`when`, AND-ed): ``equals`` (NULL-aware), ``regex_match``, each
optionally addressing a ``field_path`` inside a JSON column. ``field_paths``
on the transformation masks values *inside* a JSON document column.

Everything is Catalyst expressions (JVM, codegen) except JSON ``field_paths``
rewriting, which uses an Arrow-batched pandas UDF (documents have no static
schema — the one genuinely dynamic case).
"""

from __future__ import annotations

import hashlib
import json
import re
from collections.abc import Sequence
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipelinewise_spark.plans.spec import TransformationSpec

_SKIP_FIRST = re.compile(r"^HASH-SKIP-FIRST-(\d)$")
_SKIP_ENDS = re.compile(r"^MASK-STRING-SKIP-ENDS-(\d)$")


# --------------------------------------------------------------------- masks
def compile_mask(col: Column, transform_type: str, dtype: T.DataType) -> Column:
    """Masked-value expression for one transform type (unconditional)."""
    t = transform_type.upper()
    if t == "SET-NULL":
        return F.lit(None).cast(dtype)
    if t == "HASH":
        return F.sha2(col.cast("string"), 256)
    m = _SKIP_FIRST.match(t)
    if m:
        n = int(m.group(1))
        s = col.cast("string")
        return F.concat(
            F.substring(s, 1, n),
            F.sha2(F.substring(s, n + 1, 2147483647), 256),
        )
    if t == "MASK-DATE":
        c = col.cast("timestamp")
        # keep year + time-of-day (µs precision), force month=day=1
        return F.make_timestamp(
            F.year(c),
            F.lit(1),
            F.lit(1),
            F.hour(c),
            F.minute(c),
            F.date_format(c, "ss.SSSSSS").cast("decimal(16,6)"),
        )
    if t == "MASK-NUMBER":
        return F.lit(0).cast(dtype if isinstance(dtype, T.NumericType) else "bigint")
    if t == "MASK-HIDDEN":
        return F.lit("hidden")
    m = _SKIP_ENDS.match(t)
    if m:
        n = int(m.group(1))
        s = col.cast("string")
        return F.when(
            F.length(s) > 2 * n,
            F.concat(
                F.substring(s, 1, n),
                F.repeat(F.lit("*"), F.length(s) - 2 * n),
                s.substr(F.length(s) - (n - 1), F.lit(n)),
            ),
        ).otherwise(F.repeat(F.lit("*"), F.length(s)))
    raise ValueError(f"unknown transformation type: {transform_type}")


# --------------------------------------------------------------- conditions
def compile_condition(when: Sequence[dict[str, Any]]) -> Column | None:
    """AND-ed condition list → boolean Column (None = unconditional).

    Each entry: {column, equals} | {column, regex_match}, optional field_path
    addressing into a JSON string column
    (reference transform.py:12-81; SQL twin transform_utils.py:148-222).
    """
    if not when:
        return None
    expr: Column | None = None
    for cond in when:
        col = F.col(cond["column"])
        if cond.get("field_path"):
            col = F.get_json_object(
                col.cast("string"), "$." + cond["field_path"].replace("/", ".")
            )
        if "equals" in cond:
            v = cond["equals"]
            if v is None:
                c = col.isNull()
            elif isinstance(v, str) and v == "":
                c = col.isNull() | (col.cast("string") == "")
            else:
                c = col == F.lit(v)
        elif "regex_match" in cond:
            c = col.cast("string").rlike(cond["regex_match"])
        else:
            raise ValueError(f"unsupported condition: {cond}")
        expr = c if expr is None else (expr & c)
    return expr


# --------------------------------------------------- JSON field_paths rewrite
def _python_mask(value: Any, transform_type: str) -> Any:
    """Python twin of compile_mask for values inside JSON documents."""
    t = transform_type.upper()
    if value is None and t != "MASK-HIDDEN":
        return None
    if t == "SET-NULL":
        return None
    if t == "HASH":
        return hashlib.sha256(str(value).encode()).hexdigest()
    m = _SKIP_FIRST.match(t)
    if m:
        n = int(m.group(1))
        s = str(value)
        return s[:n] + hashlib.sha256(s[n:].encode()).hexdigest()
    if t == "MASK-NUMBER":
        return 0
    if t == "MASK-HIDDEN":
        return "hidden"
    m = _SKIP_ENDS.match(t)
    if m:
        n = int(m.group(1))
        s = str(value)
        if len(s) > 2 * n:
            return s[:n] + "*" * (len(s) - 2 * n) + s[-n:]
        return "*" * len(s)
    raise ValueError(f"unsupported in-JSON transformation: {transform_type}")


def mask_json_paths(
    col: Column, field_paths: Sequence[str], transform_type: str
) -> Column:
    """Mask values at ``a/b/c`` paths inside a JSON-string column.

    Arrow-batched pandas UDF (documents are schemaless, so this can't be a
    static Catalyst expression). Key order and non-path values are preserved.
    """
    paths = [p.split("/") for p in field_paths]

    @F.pandas_udf(T.StringType())
    def _rewrite(s: pd.Series) -> pd.Series:
        def one(doc: str | None) -> str | None:
            if doc is None:
                return None
            try:
                obj = json.loads(doc)
            except (ValueError, TypeError):
                return doc
            for path in paths:
                node = obj
                for seg in path[:-1]:
                    if not isinstance(node, dict) or seg not in node:
                        node = None
                        break
                    node = node[seg]
                if isinstance(node, dict) and path[-1] in node:
                    node[path[-1]] = _python_mask(node[path[-1]], transform_type)
            return json.dumps(obj, separators=(", ", ": "))

        return s.map(one)

    return _rewrite(col.cast("string"))


# ------------------------------------------------------------------- driver
def apply_transformations(
    df: DataFrame, transformations: Sequence[TransformationSpec | dict]
) -> DataFrame:
    """Apply a transformation list to a DataFrame (one withColumn per rule)."""
    for t in transformations:
        if isinstance(t, dict):
            t = TransformationSpec(
                field_id=t["field_id"],
                type=t["type"],
                when=t.get("when", []) or [],
                field_paths=t.get("field_paths", []) or [],
            )
        if t.field_id not in df.columns:
            raise KeyError(f"transformation targets unknown column {t.field_id!r}")
        dtype = df.schema[t.field_id].dataType
        src = F.col(t.field_id)
        if t.field_paths:
            masked = mask_json_paths(src, t.field_paths, t.type)
        else:
            masked = compile_mask(src, t.type, dtype)
        cond = compile_condition(t.when)
        if cond is not None:
            # when mask changes the column type, unify on string
            if _changes_type(t.type, dtype) and not t.field_paths:
                src = src.cast("string")
            masked = F.when(cond, masked).otherwise(src)
        df = df.withColumn(t.field_id, masked)
    return df


def _changes_type(transform_type: str, dtype: T.DataType) -> bool:
    t = transform_type.upper()
    if t in ("HASH", "MASK-HIDDEN") or _SKIP_FIRST.match(t) or _SKIP_ENDS.match(t):
        return not isinstance(dtype, T.StringType)
    return False
