"""Z-order layout: correctness of the Morton key and the pruning payoff —
a 2-D box read over the Z-ordered layout must list strictly fewer files
than the same read over the natural (orderkey) layout, without changing
the answer."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pipelinewise_spark.operators.manifest_table import ManifestTable
from pipelinewise_spark.operators.zorder import cluster_by, zvalue
from pipelinewise_spark.sources.files import read_table


def test_zvalue_interleaves_and_orders(spark):
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (None, 1)], "x int, y int"
    )
    out = df.withColumn("z", zvalue(df, ["x", "y"], bits=2)).collect()
    z = {(r["x"], r["y"]): r["z"] for r in out}
    # bits=2 grid: cell(0)=0, cell(3)=3 (=0b11). x bits land at even
    # positions, y at odd: z(3,0)=0b0101=5, z(0,3)=0b1010=10, z(3,3)=15
    assert z[(0, 0)] == 0
    assert z[(3, 0)] == 5
    assert z[(0, 3)] == 10
    assert z[(3, 3)] == 15
    assert z[(None, 1)] > z[(3, 3)] - 16  # NULL -> max cell, orders last


def test_zorder_prunes_2d_box(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="pws_ztest_")
    n_files = 8

    plain = ManifestTable(base + "/plain")
    plain.overwrite(
        orders.repartitionByRange(n_files, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    zed = ManifestTable(base + "/zed")
    zed.overwrite(
        cluster_by(orders, ["o_custkey", "o_totalprice"], num_files=n_files)
    )

    lo_c, hi_c = 100, 250
    lo_p, hi_p = 60000.0, 120000.0
    box = {"o_custkey": (lo_c, hi_c), "o_totalprice": (lo_p, hi_p)}
    plain_entries, _ = plain.select_entries(ranges=box)
    z_entries, _ = zed.select_entries(ranges=box)

    # natural order is random in both dimensions -> every file matches;
    # the Z layout confines the box to a strict subset of files
    assert len(z_entries) < len(plain_entries), (
        f"z-order did not prune: {len(z_entries)} vs {len(plain_entries)}"
    )

    flt = (
        F.col("o_custkey").between(lo_c, hi_c)
        & F.col("o_totalprice").between(lo_p, hi_p)
    )
    expect = sorted(r["o_orderkey"] for r in orders.filter(flt).collect())
    got = sorted(
        r["o_orderkey"]
        for r in zed.read(spark, ranges=box).filter(flt).collect()
    )
    assert got == expect
