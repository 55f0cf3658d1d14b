"""ParquetTable: atomic publish, readers isolated from in-flight writes,
vacuum, partition pruning."""

from __future__ import annotations

import contextlib
import io
import os

import pyspark.sql.functions as F
import pytest

from pipelinewise_spark.operators.table import ParquetTable
from pipelinewise_spark.sources.files import read_table


def test_atomic_publish_and_vacuum(spark, sf_dir, tmp_path):
    t = ParquetTable(os.path.join(str(tmp_path), "nation"))
    assert not t.exists()
    with pytest.raises(FileNotFoundError):
        t.read(spark)

    nation = read_table(spark, sf_dir, "nation")
    t.overwrite(nation)
    assert t.read(spark).count() == nation.count()

    # readers resolve the OLD snapshot while a new one is built: the version
    # pointer only moves on publish
    old_snap = t.current_snapshot()
    t.overwrite(nation.limit(5))
    assert t.current_snapshot() != old_snap
    assert t.read(spark).count() == 5
    assert os.path.exists(old_snap)  # still readable by in-flight readers

    t.overwrite(nation.limit(3))
    t.vacuum(keep=1)
    snaps = [d for d in os.listdir(t.root) if d.startswith("snap-")]
    assert len(snaps) == 1
    assert t.read(spark).count() == 3


def test_partitioned_snapshot_prunes(spark, sf_dir, tmp_path):
    t = ParquetTable(os.path.join(str(tmp_path), "orders"))
    orders = read_table(spark, sf_dir, "orders")
    t.overwrite(orders, partition_by=["o_orderstatus"])

    df = t.read(spark).filter(F.col("o_orderstatus") == "F")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert df.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_schema_cache_matches_inference(spark, sf_dir, tmp_path):
    """r13: read() serves the cached written schema for unpartitioned
    snapshots — it must be byte-identical to what footer inference
    returns (nullable-widened), and a NEW snapshot must never be served
    a stale cache entry."""
    t = ParquetTable(os.path.join(str(tmp_path), "orders"))
    orders = read_table(spark, sf_dir, "orders").limit(100)
    t.overwrite(orders)
    cached = t.read(spark).schema
    inferred = spark.read.parquet(t.current_snapshot()).schema
    assert cached == inferred

    # second overwrite with a DIFFERENT schema: cache follows the pointer
    t.overwrite(orders.withColumn("extra", F.lit(1)))
    assert "extra" in t.read(spark).columns
    assert t.read(spark).schema == spark.read.parquet(
        t.current_snapshot()
    ).schema

    # a FRESH instance (no cache) reads identical data and schema
    t2 = ParquetTable(t.root)
    assert t2.read(spark).schema == t.read(spark).schema
    assert t2.read(spark).count() == 100


def test_schema_cache_partitioned_not_cached(spark, sf_dir, tmp_path):
    """Partitioned snapshots re-infer (hive layout reorders partition
    columns and types them from directory names)."""
    t = ParquetTable(os.path.join(str(tmp_path), "orders_part"))
    orders = read_table(spark, sf_dir, "orders").limit(100)
    t.overwrite(orders, partition_by=["o_orderpriority"])
    # inference puts the partition column last; cached-from-df would not
    assert t.read(spark).schema == spark.read.parquet(
        t.current_snapshot()
    ).schema
    assert t.read(spark).count() == 100
