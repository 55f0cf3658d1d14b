"""Round-5 plan + operator assertions: the distributed global rank must
carry no single-reducer exchange, and its ntile must be bit-identical to
the SQL window at any N mod n residue."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from pipelinewise_spark.queries import QUERIES


def _plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_ntile_plan_has_no_global_sort(spark, sf_dir):
    """A bare Window.orderBy plans `Exchange SinglePartition` (one task
    sorts everything). The rewritten query must not contain one — its rank
    prefix (range shuffle + per-partition windows) lives behind a lazy
    localCheckpoint materialized once at the offsets collect."""
    df = QUERIES["ntile_documents_by_length"](spark, sf_dir)
    plan = _plan_of(df)
    assert "SinglePartition" not in plan, plan
    assert "localCheckpoint" in plan, plan
    assert "Window" not in plan, plan

    # the pre-checkpoint construction itself must range-partition, never
    # single-partition: assert on the un-checkpointed twin of _ranked
    from pyspark.sql import Window

    from pipelinewise_spark.queries import QUERIES as _q  # noqa: F401

    d = spark.range(100).selectExpr("id", "id % 7 AS k")
    pre = d.repartitionByRange(8, F.col("k"), F.col("id")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.spark_partition_id()).orderBy("k", "id")
        ),
    )
    pre_plan = _plan_of(pre)
    assert "rangepartitioning" in pre_plan.lower(), pre_plan
    assert "SinglePartition" not in pre_plan, pre_plan


def test_distributed_row_number_matches_window(spark):
    from pyspark.sql import Window

    from pipelinewise_spark.operators.rank import distributed_row_number

    rows = [(i, (i * 37) % 13) for i in range(101)]
    df = spark.createDataFrame(rows, "id long, k long")
    got = {
        (r["id"], r["rank"])
        for r in distributed_row_number(
            df, ["k", "id"], out_col="rank", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("k", "id")
    want = {
        (r["id"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_ntile_exact_matches_window_all_residues(spark):
    """NTILE's uneven-bucket rule (first N mod n buckets get the extra
    row) must hold for every residue class, including N < n."""
    from pyspark.sql import Window

    from pipelinewise_spark.operators.rank import ntile_exact

    for total in (2, 7, 8, 9, 10, 11, 101):
        df = spark.createDataFrame(
            [(i, (i * 31) % 17) for i in range(total)], "id long, k long"
        )
        got = {
            (r["id"], r["b"])
            for r in ntile_exact(
                df, ["k", "id"], 4, out_col="b", num_partitions=5
            ).collect()
        }
        w = Window.orderBy("k", "id")
        want = {
            (r["id"], r["b"])
            for r in df.withColumn("b", F.ntile(4).over(w)).collect()
        }
        assert got == want, f"N={total}"
