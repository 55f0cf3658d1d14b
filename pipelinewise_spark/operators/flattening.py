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
MAX_KEY_LENGTH = 255  # reference: warehouse identifier limit (flatten_key)


def _abbreviate(segment: str) -> str:
    """One segment → its camel-case initials (reference: strip lowercase from
    ``inflection.camelize(segment)``); when that leaves ≤1 char, the first 3
    chars of the original. Always lowercased."""
    camel = "".join(w[:1].upper() + w[1:] if w else "" for w in segment.split("_"))
    reduced = "".join(ch for ch in camel if not ("a" <= ch <= "z"))
    return (reduced if len(reduced) > 1 else segment[:3]).lower()


def flatten_key(segments: list[str], sep: str = SEPARATOR) -> str:
    """Join path segments with ``sep``, compacting segments left-to-right
    while the joined key is >= 255 chars (target-snowflake
    flattening.py:22-40 ``flatten_key``)."""
    parts = list(segments)
    i = 0
    while len(sep.join(parts)) >= MAX_KEY_LENGTH and i < len(parts):
        parts[i] = _abbreviate(parts[i])
        i += 1
    return sep.join(parts)


def _flatten_cols(
    segments: list[str], col: Column, dtype: T.DataType, levels_left: int
) -> list[tuple[str, Column]]:
    if isinstance(dtype, T.StructType) and levels_left > 0:
        out: list[tuple[str, Column]] = []
        for f in dtype.fields:
            out.extend(
                _flatten_cols(
                    segments + [f.name],
                    col.getField(f.name),
                    f.dataType,
                    levels_left - 1,
                )
            )
        return out
    name = flatten_key(segments)
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        # deeper than max level (or non-struct nested): JSON-dump
        return [(name, F.to_json(col))]
    return [(name, col)]


def flatten(df: DataFrame, max_level: int = 0) -> DataFrame:
    """Flatten struct columns up to ``max_level`` (0 = JSON-dump all nested).

    Column naming matches the reference: ``a__b__c``, with >=255-char keys
    compacted segment-by-segment. Compaction (or the raw input) producing
    two identical column names raises, as the reference's ``flatten_schema``
    does (flattening.py:110-113).
    """
    cols: list[Column] = []
    seen: set[str] = set()
    for f in df.schema.fields:
        for name, c in _flatten_cols([f.name], F.col(f.name), f.dataType, max_level):
            if name in seen:
                raise ValueError(f"Duplicate column name produced in schema: {name}")
            seen.add(name)
            cols.append(c.alias(name))
    return df.select(*cols)
