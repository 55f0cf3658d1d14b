"""The SQL mask emitter must agree with the Column-expression compiler:
run the generated SQL in DuckDB against the same parquet and compare with the
Spark result — two independent implementations, one truth table
(mirrors the reference's transform.py / transform_utils.py pairing)."""

from __future__ import annotations

import os

from pipelinewise_spark.functions.masking import apply_transformations
from pipelinewise_spark.functions.masking_sql import (
    masked_select_list,
    transformation_sql,
)
from pipelinewise_spark.sources.files import read_table
from tests.conftest import SF_DIR
from tests.oracle import duckdb_connection

TRANSFORMS = [
    {"field_id": "c_name", "type": "HASH"},
    {"field_id": "c_acctbal", "type": "MASK-NUMBER"},
    {
        "field_id": "c_mktsegment",
        "type": "MASK-STRING-SKIP-ENDS-2",
        "when": [{"column": "c_nationkey", "equals": 3}],
    },
]


def test_sql_emitter_matches_column_compiler(spark):
    customer = read_table(spark, SF_DIR, "customer")
    spark_rows = {
        r.c_custkey: (r.c_name, float(r.c_acctbal), r.c_mktsegment)
        for r in apply_transformations(customer, TRANSFORMS)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .collect()
    }

    cols = masked_select_list(
        ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"], TRANSFORMS
    )
    select = ", ".join(
        name if expr == name else f"{expr} AS {name}" for name, expr in cols
    )
    con = duckdb_connection(SF_DIR)
    sql_rows = {
        r[0]: (r[1], float(r[2]), r[3])
        for r in con.execute(f"SELECT {select} FROM customer").fetchall()
    }
    assert spark_rows == sql_rows


def test_conditional_sql_shape():
    sql = transformation_sql(
        {
            "field_id": "email",
            "type": "HASH",
            "when": [
                {"column": "country", "equals": "GB"},
                {"column": "email", "regex_match": ".*@corp.com$"},
            ],
        }
    )
    assert sql.startswith("CASE WHEN country = 'GB' AND regexp_matches(")
    assert "sha256(CAST(email AS VARCHAR))" in sql
    assert sql.endswith("ELSE CAST(email AS VARCHAR) END")
