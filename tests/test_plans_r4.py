"""Plan assertions for the round-4 operators: the scale claims made in
docstrings must be visible in the physical plan."""

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


def test_zorder_key_is_pure_column(spark, sf_dir):
    from pipelinewise_spark.operators.zorder import cluster_by
    from pipelinewise_spark.sources.files import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plan = _plan_of(cluster_by(orders, ["o_custkey", "o_totalprice"]))
    # Morton key must be codegen'd JVM expressions, never a Python UDF,
    # laid out by ONE range exchange + in-partition sort (no global sort)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "rangepartitioning" in plan.lower()
    # exactly one exchange node in the tree (node ids repeat in the detail
    # section, so count detail headers: "(N) Exchange")
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_incremental_mv_never_scans_base(spark, sf_dir):
    """The MV delta plan must read the change feed and the MV only — the
    base table (lineitem here, a distinct path) must not appear."""
    from pipelinewise_spark.operators.incremental_agg import (
        apply_change_feed,
        build_aggregate,
    )

    base = spark.createDataFrame(
        [(1, "a", 1.0)], "id long, grp string, val double"
    )
    mv = build_aggregate(base, ["grp"], {"total": "val"})
    # materialize the MV as its own table (as a real pipeline would)
    import tempfile

    p = tempfile.mkdtemp(prefix="pws_mvplan_") + "/mv"
    mv.write.parquet(p)
    mv_stored = spark.read.parquet(p)
    changes = spark.createDataFrame(
        [("i", None, None, "a", 2.0)],
        "op string, old_grp string, old_val double, "
        "new_grp string, new_val double",
    )
    out = apply_change_feed(mv_stored, changes, ["grp"], {"total": "val"})
    plan = _plan_of(out)
    # one scan of the stored MV; the delta side is the in-memory feed —
    # no second parquet relation may appear
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_salted_join_matches_plain_and_spreads_keys(spark, sf_dir):
    from pipelinewise_spark.operators.skew import salted_join
    from pipelinewise_spark.sources.files import read_table

    events = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    users = (
        read_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_name")
    )
    plain = events.join(users, "user_id").count()
    assert salted_join(events, users, ["user_id"]).count() == plain
    # left join keeps unmatched fact rows
    lp = events.join(users, "user_id", "left").count()
    assert salted_join(events, users, ["user_id"], how="left").count() == lp


def test_pack_sequences_stage_is_arrow_batched(spark, sf_dir):
    plan = _plan_of(QUERIES["pack_sequences_documents"](spark, sf_dir))
    # the per-shard greedy loop must run as one Arrow FlatMapGroupsInPandas
    # stage, never row-at-a-time Python
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
