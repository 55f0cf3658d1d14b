"""JSON-Schema Draft-7 → Constraint compiler (operators/validation.py),
mirroring the reference's per-record jsonschema validation semantics
(target_snowflake/__init__.py:148-158)."""

from __future__ import annotations

import pytest

from pipelinewise_spark.operators.validation import (
    compile_json_schema,
    validate,
)

SCHEMA = {
    "type": "object",
    "required": ["id", "name"],
    "properties": {
        "id": {"type": "integer", "multipleOf": 1},
        "name": {"type": "string", "minLength": 2, "maxLength": 5},
        "status": {"type": ["string", "null"], "enum": ["a", "b"]},
        "score": {"type": ["number", "null"], "minimum": 0,
                  "exclusiveMaximum": 10},
        "code": {"type": ["string", "null"], "pattern": "^[A-Z]{3}$"},
    },
}


def test_compiles_expected_constraints():
    cons = compile_json_schema(SCHEMA)
    assert [(c.column, c.kind) for c in cons] == [
        ("id", "not_null"), ("id", "multiple_of"),
        ("name", "not_null"), ("name", "min_length"), ("name", "max_length"),
        ("status", "in_set"),
        ("score", "ge"), ("score", "lt"),
        ("code", "matches"),
    ]


def test_validate_rows_against_schema(spark):
    df = spark.createDataFrame(
        [
            (1, "abc", "a", 5.0, "ABC"),       # fully valid
            (None, "abc", "a", 5.0, "ABC"),    # id null -> required fails
            (2, "a", "c", 10.0, "abcd"),       # short name, bad enum,
                                               # score not < 10, bad pattern
            (3, "abcdef", None, None, None),   # name too long; nulls allowed
        ],
        "id int, name string, status string, score double, code string",
    )
    out = validate(df, compile_json_schema(SCHEMA)).collect()
    by_name = {r.name: r for r in out}
    assert by_name["abc"].is_valid in (True, False)
    valid = [r for r in out if r.is_valid]
    assert len(valid) == 1 and valid[0].id == 1
    r2 = [r for r in out if r.id == 2][0]
    assert set(r2.violations) == {
        "name:min_length", "status:in_set", "score:lt", "code:matches",
    }
    r3 = [r for r in out if r.id == 3][0]
    assert r3.violations == ["name:max_length"]
    rnull = [r for r in out if r.id is None][0]
    assert "id:not_null" in rnull.violations


def test_multiple_of_decimal_exact(spark):
    cons = compile_json_schema(
        {"properties": {"v": {"type": "number", "multipleOf": 0.01}}}
    )
    df = spark.createDataFrame(
        [(1.23,), (1.234,), (100.0,)], "v double"
    )
    out = {r.v: r.is_valid for r in validate(df, cons).collect()}
    assert out == {1.23: True, 1.234: False, 100.0: True}


def test_long_precision_multiple_of_rejected():
    with pytest.raises(ValueError, match="multipleOf"):
        compile_json_schema(
            {"properties": {"v": {"multipleOf": 0.123456789012345678}}}
        )


def test_nullable_type_not_required_allows_null(spark):
    cons = compile_json_schema(
        {"required": ["x"], "properties": {"x": {"type": ["integer", "null"]}}}
    )
    # required but nullable type -> no not_null constraint (Draft-7: null is
    # a valid instance of type ["integer","null"] even when required)
    assert cons == []


def test_quarantine_split_partitions_input(spark, sf_dir):
    from pipelinewise_spark.operators.validation import (
        compile_json_schema,
        quarantine_split,
    )
    from pipelinewise_spark.sources.files import read_table

    schema = {
        "type": "object",
        "required": ["event_id"],
        "properties": {
            "value": {"type": ["number", "null"], "minimum": 0, "maximum": 50},
        },
    }
    events = read_table(spark, sf_dir, "events")
    valid, dlq = quarantine_split(events, compile_json_schema(schema))
    assert valid.count() + dlq.count() == events.count()
    assert valid.columns == events.columns  # audit columns dropped
    assert set(dlq.columns) == {"_dlq_record", "violations"}
    # quarantined payloads replay: every record parses back to its id
    import pyspark.sql.functions as F

    parsed = dlq.select(
        F.get_json_object("_dlq_record", "$.event_id").isNotNull().alias("ok")
    )
    assert parsed.filter(~F.col("ok")).count() == 0
