"""Round-11 ADVICE fixes, pinned:

- k_anonymous/l_diverse measure NULL-quasi classes (null-safe class
  join) instead of failing open;
- StreamingQualityMonitor's Benford fold counts NULL-segment rows,
  matching the batch twin's unfiltered benford_report row for row;
- the quality CLI verb exits cleanly on a zero-version table and on a
  --ref-version that is not older than the live version.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.operators.expectations import (
    expectations_report,
    k_anonymous,
    l_diverse,
)


def test_k_anonymous_null_quasi_class_is_measured(spark):
    # 6 rows in class 'A' (>= k), 2 rows in the NULL class (< k): the
    # gate must see the null class — ratio 6/8, fail at min_ratio=1.0
    df = spark.createDataFrame(
        [("A", i) for i in range(6)] + [(None, 10), (None, 11)],
        "qi string, payload int",
    )
    row = expectations_report(df, [k_anonymous(["qi"], k=3)]).collect()[0]
    assert row["metric"] == pytest.approx(6 / 8)
    assert not row["passed"]


def test_k_anonymous_multi_col_null_quasi(spark):
    # the null-safe join must hold per column: (NULL, 'x') is one class
    df = spark.createDataFrame(
        [("A", "x", 1)] * 4 + [(None, "x", 2)] * 2 + [(None, None, 3)],
        "q1 string, q2 string, payload int",
    )
    row = expectations_report(
        df, [k_anonymous(["q1", "q2"], k=2)]
    ).collect()[0]
    # classes: (A,x)=4 ok, (NULL,x)=2 ok, (NULL,NULL)=1 below k
    assert row["metric"] == pytest.approx(6 / 7)
    assert not row["passed"]


def test_l_diverse_null_quasi_class_is_measured(spark):
    # NULL class: 3 rows all sharing one sensitive value -> not l-diverse
    df = spark.createDataFrame(
        [("A", "s1"), ("A", "s2"), ("A", "s1"), ("A", "s2")]
        + [(None, "s1"), (None, "s1"), (None, "s1")],
        "qi string, sens string",
    )
    row = expectations_report(
        df, [l_diverse(["qi"], "sens", l_min=2)]
    ).collect()[0]
    assert row["metric"] == pytest.approx(4 / 7)
    assert not row["passed"]


def test_stream_benford_counts_null_segment_rows(spark, tmp_path):
    """Null-segment rows with positive values count in the batch twin's
    Benford matrix; the streaming fold must count them identically —
    the drained report equals the batch twin ROW FOR ROW even when the
    current epoch carries null segments."""
    from pipelinewise_spark.operators.monitors import (
        StreamingQualityMonitor,
        quality_report_streamable,
    )

    ref = spark.range(0, 600).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("seg"),
        (F.col("id") % 37).alias("k"),
        (F.col("id") % 90 + 1).cast("double").alias("v"),
    )
    # every third current row has a NULL segment but a positive value
    cur = spark.range(600, 1200).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 3 == 0, F.lit(None))
        .otherwise((F.col("id") % 2).cast("string"))
        .alias("seg"),
        (F.col("id") % 37).alias("k"),
        (F.col("id") % 90 + 1).cast("double").alias("v"),
    )
    mon = StreamingQualityMonitor(
        ref, "v", "k", "seg", ["event_id"], str(tmp_path / "st")
    )
    for i in range(3):
        mon.on_batch(cur.filter(F.col("event_id") % 3 == i), i)
    got = sorted(map(tuple, mon.report(spark).collect()))
    want = sorted(
        map(
            tuple,
            quality_report_streamable(
                ref, cur, "v", "k", "seg", ["event_id"]
            ).collect(),
        )
    )
    assert got == want
    # and the benford rows really did see the null-segment rows: their
    # digit counts cover the FULL current epoch (600 rows, all v > 0)
    ben_n = sum(
        int(r["metric"] >= 0) for r in mon.report(spark).collect()
        if r["monitor"] == "benford"
    )
    assert ben_n == 9


def test_cli_quality_guards(capsys, spark, tmp_path):
    from pipelinewise_spark.__main__ import main as cli_main
    from pipelinewise_spark.operators.manifest_table import ManifestTable

    root = str(tmp_path / "t")
    # zero-version table: helpful SystemExit, not IndexError
    ManifestTable(root)
    with pytest.raises(SystemExit, match="no committed snapshots"):
        cli_main([
            "quality", root, "--value-col", "v",
            "--key-col", "k", "--segment-col", "seg",
        ])

    df = spark.createDataFrame(
        [(i, str(i % 2), float(i % 9 + 1)) for i in range(40)],
        "k long, seg string, v double",
    )
    t = ManifestTable(root)
    v1 = t.overwrite(df)
    t.merge(spark, df.withColumn("v", F.col("v") + 1.0), ["k"])
    cur_v = t.versions()[-1]
    assert v1 is not None and cur_v is not None
    # ref == live: rejected (empty change feed would read as max drift)
    with pytest.raises(SystemExit, match="must be OLDER"):
        cli_main([
            "quality", root, "--value-col", "v",
            "--key-col", "k", "--segment-col", "seg",
            "--ref-version", str(cur_v),
        ])
