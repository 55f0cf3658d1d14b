"""Nested-object flattening with ``__`` separator and depth limit.

Reference: ``flatten_schema``/``flatten_record`` (target-snowflake
flattening.py:22-161) — nested dicts become ``parent__child`` columns up to
``data_flattening_max_level``; anything deeper is serialized as a JSON
string. Spark shape: a recursive projection over StructType fields — pure
Catalyst ``select``, zero UDFs; depth-exceeded structs go through
``to_json``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEPARATOR = "__"


def _flatten_cols(
    prefix: str, col: Column, dtype: T.DataType, levels_left: int
) -> list[tuple[str, Column]]:
    if isinstance(dtype, T.StructType) and levels_left > 0:
        out: list[tuple[str, Column]] = []
        for f in dtype.fields:
            out.extend(
                _flatten_cols(
                    f"{prefix}{SEPARATOR}{f.name}",
                    col.getField(f.name),
                    f.dataType,
                    levels_left - 1,
                )
            )
        return out
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        # deeper than max level (or non-struct nested): JSON-dump
        return [(prefix, F.to_json(col))]
    return [(prefix, col)]


def flatten(df: DataFrame, max_level: int = 0) -> DataFrame:
    """Flatten struct columns up to ``max_level`` (0 = JSON-dump all nested).

    Column naming matches the reference: ``a__b__c``.
    """
    cols: list[Column] = []
    for f in df.schema.fields:
        for name, c in _flatten_cols(f.name, F.col(f.name), f.dataType, max_level):
            cols.append(c.alias(name))
    return df.select(*cols)
