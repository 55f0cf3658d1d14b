"""Property-based masking tests: the Column-expression compiler must agree
with a reference-semantics Python model (transform-field transform.py:147-196)
on arbitrary strings — one batched Spark round-trip per property."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from pipelinewise_spark.functions.masking import compile_mask

# printable unicode minus surrogates; includes quotes, backslashes, CJK
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=32),
    min_size=0, max_size=40,
)


def _model(value: str, ttype: str) -> str | None:
    """Reference semantics in plain Python."""
    if ttype == "HASH":
        return hashlib.sha256(value.encode()).hexdigest()
    if ttype.startswith("HASH-SKIP-FIRST-"):
        n = int(ttype[-1])
        return value[:n] + hashlib.sha256(value[n:].encode()).hexdigest()
    if ttype.startswith("MASK-STRING-SKIP-ENDS-"):
        n = int(ttype[-1])
        if len(value) > 2 * n:
            return value[:n] + "*" * (len(value) - 2 * n) + value[-n:]
        return "*" * len(value)
    if ttype == "MASK-HIDDEN":
        return "hidden"
    if ttype == "SET-NULL":
        return None
    raise AssertionError(ttype)


def _run_batch(spark, values: list[str], ttype: str) -> list[str | None]:
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(
        compile_mask(F.col("v"), ttype, df.schema["v"].dataType).alias("m")
    )
    return [r.m for r in out.collect()]


@settings(max_examples=12, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=24))
def test_hash_matches_model(spark, values):
    assert _run_batch(spark, values, "HASH") == [
        _model(v, "HASH") for v in values
    ]


@settings(max_examples=12, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=24),
       st.integers(min_value=1, max_value=9))
def test_hash_skip_first_matches_model(spark, values, n):
    t = f"HASH-SKIP-FIRST-{n}"
    assert _run_batch(spark, values, t) == [_model(v, t) for v in values]


@settings(max_examples=12, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=24),
       st.integers(min_value=1, max_value=9))
def test_mask_skip_ends_matches_model(spark, values, n):
    t = f"MASK-STRING-SKIP-ENDS-{n}"
    assert _run_batch(spark, values, t) == [_model(v, t) for v in values]


def test_mask_date_keeps_year_and_time(spark):
    df = spark.createDataFrame(
        [("2024-07-19 13:45:30.123456",), ("1999-12-31 23:59:59.999999",)],
        "v string",
    ).select(F.col("v").cast("timestamp").alias("v"))
    out = df.select(
        compile_mask(F.col("v"), "MASK-DATE", df.schema["v"].dataType).alias("m")
    ).collect()
    assert str(out[0].m) == "2024-01-01 13:45:30.123456"
    assert str(out[1].m) == "1999-01-01 23:59:59.999999"
