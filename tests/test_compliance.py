"""Right-to-be-forgotten (operators/compliance.py): the subject's bytes
must be PHYSICALLY gone — from live reads, from history, from disk."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pipelinewise_spark.operators.compliance import forget
from pipelinewise_spark.operators.manifest_table import ManifestTable


def _subject_bytes_on_disk(root: str, needle: bytes) -> list[str]:
    hits = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as fh:
                if needle in fh.read():
                    hits.append(p)
    return hits


def test_forget_erases_live_history_and_disk(spark, tmp_path):
    root = os.path.join(str(tmp_path), "t")
    t = ManifestTable(root, ["p"])
    df = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        F.concat(F.lit("SUBJECT-EMAIL-"), F.col("id")).alias("email"),
    )
    t.overwrite(df)
    # a second snapshot so history exists
    t.merge(spark, df.filter(F.col("k") >= 48), ["k"])
    needle = b"SUBJECT-EMAIL-7"
    assert _subject_bytes_on_disk(root, needle)

    out = forget(spark, t, "email = 'SUBJECT-EMAIL-7'")
    assert out["deleted_rows"] == 1
    assert out["rewritten_partitions"] >= 1
    assert out["expired_snapshots"]
    assert out["pinning_branches"] == []
    # live table: row gone, everything else intact
    left = t.read(spark)
    assert left.count() == 49
    assert left.filter(F.col("k") == 7).count() == 0
    # history: only the live snapshot remains
    assert len(t.versions()) == 1
    # disk: no surviving parquet contains the subject's bytes
    assert _subject_bytes_on_disk(root, needle) == []


def test_forget_reports_pinning_branches(spark, tmp_path):
    root = os.path.join(str(tmp_path), "t2")
    t = ManifestTable(root, [])
    t.overwrite(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
    )
    t.create_branch("hold")
    out = forget(spark, t, "k = 3")
    # the branch still pins the pre-delete snapshot: erasure incomplete
    # and the report says so
    assert out["pinning_branches"] == ["hold"]
