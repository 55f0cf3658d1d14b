"""Partition evolution: spec changes without data rewrite, conservative
reads over mixed layouts, migration on first merge, pruning afterwards."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pipelinewise_spark.operators.manifest_table import ManifestTable
from pipelinewise_spark.sources.files import read_table


def _orders(spark, sf_dir):
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_evolve_then_merge_migrates_and_prunes(spark, sf_dir):
    orders = _orders(spark, sf_dir)
    t = ManifestTable(tempfile.mkdtemp(prefix="pws_pe_") + "/t")
    t.overwrite(orders.repartition(4))  # unpartitioned, 4 legacy files

    t.set_partition_spec(spark, ["o_orderstatus"])
    # spec change rewrote nothing
    entries, m = t.select_entries()
    assert m["partition_by"] == ["o_orderstatus"]
    assert all("o_orderstatus" not in e["partition"] for e in entries)
    # reads over the mixed layout are unpruned on the new key (conservative)
    sliced, _ = t.select_entries(partitions={"o_orderstatus": ["O"]})
    assert len(sliced) == len(entries)
    assert t.read(spark).count() == orders.count()

    # first merge after evolution migrates legacy files to the new layout
    batch = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    t.merge(spark, batch, ["o_orderkey"])
    entries2, _ = t.select_entries()
    assert all("o_orderstatus" in e["partition"] for e in entries2)
    assert t.read(spark).count() == orders.count()
    got = (
        t.read(spark)
        .filter(F.col("o_orderkey") % 100 == 0)
        .agg(F.min(F.col("o_totalprice")))
        .collect()[0][0]
    )
    base_min = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .agg(F.min("o_totalprice"))
        .collect()[0][0]
    )
    assert abs(got - (base_min + 1.0)) < 1e-9

    # second merge touching ONE status now carries untouched partitions over
    before = {e["path"] for e in entries2}
    one_status = (
        t.read(spark).filter(F.col("o_orderstatus") == "F").limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") + 2.0)
    )
    t.merge(spark, one_status, ["o_orderkey"])
    entries3, _ = t.select_entries()
    carried = {e["path"] for e in entries3} & before
    untouched_before = {
        e["path"] for e in entries2
        if e["partition"].get("o_orderstatus") != "F"
    }
    assert untouched_before and untouched_before <= carried


def test_overwrite_uses_live_spec_on_fresh_handle(spark, sf_dir):
    orders = _orders(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="pws_pe2_") + "/t"
    t = ManifestTable(root)
    t.overwrite(orders)
    t.set_partition_spec(spark, ["o_orderstatus"])

    t2 = ManifestTable(root)  # fresh handle, no constructor spec
    t2.overwrite(orders)
    entries, m = t2.select_entries()
    assert m["partition_by"] == ["o_orderstatus"]
    assert all("o_orderstatus" in e["partition"] for e in entries)
