"""Flattening parity details: 255-char key compaction, duplicate detection
(target-snowflake flattening.py:22-113), and per-file ``_sdc_source_lineno``
for line-based file sources (tap-s3-csv sync.py:84-91)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pipelinewise_spark.operators.flattening import flatten, flatten_key
from pipelinewise_spark.sources.files import FileSource


def test_flatten_key_short_unchanged():
    assert flatten_key(["order", "shipping", "city"]) == "order__shipping__city"


def test_flatten_key_compacts_left_to_right():
    seg1 = "_".join(["alpha"] * 45)  # 269 chars
    key = flatten_key([seg1, "beta_gamma"])
    # camelize + strip-lowercase => one initial per word, lowercased
    assert key == "a" * 45 + "__beta_gamma"
    assert len(key) < 255


def test_flatten_key_single_word_falls_back_to_3_chars():
    # initials of a one-word segment collapse to 1 char -> first 3 chars
    key = flatten_key(["x" * 300, "y" * 300])
    assert key == "xxx__yyy"


def test_flatten_key_stops_when_under_limit():
    seg = "_".join(["word"] * 30)  # 179 chars
    # two long segments: only the first is compacted, then we're under 255
    key = flatten_key([seg, seg])
    assert key == "w" * 30 + "__" + seg
    # exactly the reference's loop: compact again only if still >= 255
    assert len(key) < 255


def test_flatten_preserves_mixed_case_initials():
    # uppercase chars already in the segment survive abbreviation
    key = flatten_key(["myHTTPKey_value", "z" * 250])
    assert key.startswith("mhttpkv__")


def test_flatten_duplicate_columns_raise(spark):
    df = spark.range(1).select(
        F.struct(F.lit(1).alias("b")).alias("a"),
        F.lit(2).alias("a__b"),
    )
    try:
        flatten(df, max_level=1)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "Duplicate column name" in str(e)


def test_flatten_long_nested_key_compacted(spark):
    inner = "_".join(["field"] * 50)  # 299 chars
    df = spark.range(1).select(F.struct(F.lit(7).alias(inner)).alias("props"))
    out = flatten(df, max_level=1)
    # left-to-right: "props" -> "pro" first, still >=255, then the long
    # segment -> initials
    assert out.columns == ["pro__" + "f" * 50]
    assert out.collect()[0][0] == 7


def test_sdc_source_lineno_csv_header(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.csv").write_text("id,v\n1,x\n2,y\n3,z\n")
    (d / "b.csv").write_text("id,v\n9,q\n")
    df = FileSource(path=str(d), format="csv").read(
        spark, with_source_metadata=True
    )
    rows = df.select("id", "_sdc_source_file", "_sdc_source_lineno").collect()
    got = {r.id: (r._sdc_source_file.rsplit("/", 1)[-1], r._sdc_source_lineno)
           for r in rows}
    # header CSV: record 1 sits on physical line 2 (reference sync.py:89)
    assert got == {
        1: ("a.csv", 2), 2: ("a.csv", 3), 3: ("a.csv", 4), 9: ("b.csv", 2),
    }


def test_sdc_source_lineno_jsonl(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.jsonl").write_text('{"id": 1}\n{"id": 2}\n')
    df = FileSource(path=str(d), format="json").read(
        spark, with_source_metadata=True
    )
    got = {r.id: r._sdc_source_lineno
           for r in df.select("id", "_sdc_source_lineno").collect()}
    # no header line in JSONL: numbering starts at 1
    assert got == {1: 1, 2: 2}


def test_flatten_key_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                               max_codepoint=127),
        min_size=1, max_size=120,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(seg, min_size=1, max_size=6))
    def check(segments):
        from pipelinewise_spark.operators.flattening import (
            SEPARATOR, flatten_key,
        )

        key = flatten_key(segments)
        # deterministic
        assert key == flatten_key(segments)
        # joins exactly len(segments) parts
        assert len(key.split(SEPARATOR)) >= len(segments)  # parts may contain no sep
        # under the limit unless EVERY segment was already compacted
        # (reference loop gives up after one pass)
        if len(key) >= 255:
            short = flatten_key([s for s in segments])
            assert short == key  # stable fixed point

    check()
