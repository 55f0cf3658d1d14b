"""Aggregate-navigation router (operators/mv_router.py): routing picks
the coarsest eligible rollup, the rewritten plan scans the ROLLUP's
files (never the base), measures re-aggregate correctly (incl. derived
AVG), and requests no rollup can answer fall back to the base table."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.operators.mv_router import Measure, Rollup, RollupCatalog
from pipelinewise_spark.sources.files import read_table


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def catalog(spark, sf_dir, tmp_path):
    cat = RollupCatalog(lambda s: read_table(s, sf_dir, "orders"))
    cat.add_measure(Measure("revenue", "sum", "o_totalprice"))
    cat.add_measure(Measure("orders", "count"))
    cat.add_measure(Measure("max_price", "max", "o_totalprice"))
    cat.add_measure(
        Measure("avg_price", "avg",
                sum_measure="revenue", count_measure="orders")
    )

    paths = {}

    def writer(name):
        def w(frame):
            path = os.path.join(str(tmp_path), name)
            frame.write.mode("overwrite").parquet(path)
            paths[name] = path
            return lambda s: s.read.parquet(path)
        return w

    cat.materialize_rollup(
        spark, "by_pri_status", ("o_orderpriority", "o_orderstatus"),
        ["revenue", "orders", "max_price"], writer("ps"),
    )
    cat.materialize_rollup(
        spark, "by_pri", ("o_orderpriority",),
        ["revenue", "orders"], writer("p"),
    )
    return cat, paths


def test_route_prefers_coarsest_eligible(catalog):
    cat, _ = catalog
    assert cat.route(["o_orderpriority"], ["revenue"]).name == "by_pri"
    # max_price only stored in the fine rollup -> must route there
    assert (
        cat.route(["o_orderpriority"], ["max_price"]).name == "by_pri_status"
    )
    # dims not covered by any rollup -> base
    assert cat.route(["o_custkey"], ["revenue"]) is None


def test_rewritten_plan_scans_rollup_not_base(spark, catalog):
    cat, paths = catalog
    df = cat.query(spark, ["o_orderpriority"], ["revenue", "orders"])
    plan = _plan_of(df)
    assert paths["p"] in plan
    assert "orders.parquet" not in plan


def test_rollup_answers_match_base(spark, catalog):
    cat, _ = catalog
    for dims, measures in [
        (["o_orderpriority"], ["revenue", "orders", "avg_price"]),
        (["o_orderpriority", "o_orderstatus"], ["revenue", "max_price"]),
        (["o_orderstatus"], ["orders", "max_price"]),
    ]:
        routed = cat.query(spark, dims, measures)
        base = cat._from_base(spark, dims, measures)
        got = {tuple(r[d] for d in dims): r for r in routed.collect()}
        want = {tuple(r[d] for d in dims): r for r in base.collect()}
        assert set(got) == set(want), (dims, measures)
        for key in want:
            for m in measures:
                gv, wv = got[key][m], want[key][m]
                if m == "avg_price":
                    assert abs(float(gv) - float(wv)) < 1e-6, (key, m)
                else:
                    assert gv == wv, (key, m)


def test_base_fallback_when_unroutable(spark, catalog):
    cat, paths = catalog
    df = cat.query(spark, ["o_orderstatus", "o_custkey"], ["revenue"])
    plan = _plan_of(df)
    assert "orders.parquet" in plan
    for p in paths.values():
        assert p not in plan


def test_measure_validation():
    cat = RollupCatalog(lambda s: None)
    with pytest.raises(ValueError):
        cat.add_measure(Measure("bad", "median", "x"))
    with pytest.raises(ValueError):
        cat.add_measure(Measure("bad_avg", "avg"))
    cat.add_measure(Measure("ok", "sum", "x"))
    with pytest.raises(ValueError):
        cat.add_rollup(
            Rollup("r", ("d",), lambda s: None, {"mystery": "c"})
        )


# ------------------------------------------------- star schema


@pytest.fixture()
def star_catalog(spark, sf_dir):
    from pipelinewise_spark.operators.mv_router import Dimension, StarSchema

    star = StarSchema(lambda s: read_table(s, sf_dir, "orders"))
    star.add_dimension(Dimension(
        "customer", lambda s: read_table(s, sf_dir, "customer"),
        fact_fk="o_custkey", dim_pk="c_custkey",
        attributes=("c_mktsegment", "c_nationkey"),
    ))
    star.add_dimension(Dimension(
        "nation", lambda s: read_table(s, sf_dir, "nation"),
        fact_fk="c_nationkey", dim_pk="n_nationkey",
        attributes=("n_name",),
    ))
    cat = RollupCatalog(star)
    cat.add_measure(Measure("revenue", "sum", "o_totalprice"))
    cat.add_measure(Measure("orders", "count"))
    return cat, star


def test_star_join_pruning(spark, star_catalog):
    cat, star = star_catalog
    # fact-only grain: NO dimension joined
    plan = _plan_of(cat.query(spark, ["o_orderpriority"], ["revenue"]))
    assert "customer.parquet" not in plan and "nation.parquet" not in plan
    # customer attr: customer joined, nation not
    plan = _plan_of(cat.query(spark, ["c_mktsegment"], ["revenue"]))
    assert "customer.parquet" in plan and "nation.parquet" not in plan
    # snowflake attr pulls BOTH arms in (nation keys off customer)
    plan = _plan_of(cat.query(spark, ["n_name"], ["revenue"]))
    assert "customer.parquet" in plan and "nation.parquet" in plan


def test_star_base_matches_manual_join(spark, star_catalog, sf_dir):
    cat, _ = star_catalog
    got = {
        r.n_name: (round(float(r.revenue), 4), r.orders)
        for r in cat.query(spark, ["n_name"], ["revenue", "orders"]).collect()
    }
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    want = {
        r.n_name: (round(float(r.rev), 4), r.cnt)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"), F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want


def test_star_rollup_routing_and_parity(spark, star_catalog, tmp_path):
    cat, _ = star_catalog

    def writer(frame):
        path = str(tmp_path / "np")
        frame.write.mode("overwrite").parquet(path)
        return lambda s: s.read.parquet(path)

    cat.materialize_rollup(
        spark, "by_nation", ("n_name",), ["revenue", "orders"], writer,
    )
    routed = cat.query(spark, ["n_name"], ["revenue", "orders"])
    plan = _plan_of(routed)
    assert "orders.parquet" not in plan  # no fact scan at serve time
    base = cat._from_base(spark, ["n_name"], ["revenue", "orders"])
    got = {r.n_name: (round(float(r.revenue), 4), r.orders)
           for r in routed.collect()}
    want = {r.n_name: (round(float(r.revenue), 4), r.orders)
            for r in base.collect()}
    assert got == want
