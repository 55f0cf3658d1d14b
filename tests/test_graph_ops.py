"""Degree-oriented triangle counting (functions/graph.py) vs brute force
on randomized graphs — including duplicate / reversed / self-loop edges
that the canonicalization must absorb."""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F

from pipelinewise_spark.functions.graph import triangle_count


def _brute(edges):
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nodes = {n for e in canon for n in e}
    eset = canon
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    )
    return len(nodes), len(canon), tri


def test_triangle_count_random(spark):
    rng = random.Random(13)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(300)]
    # inject noise the operator must normalize away
    edges += [(v, u) for u, v in edges[:50]] + [(5, 5), (7, 7)]
    df = spark.createDataFrame(edges, "u long, v long")
    row = triangle_count(df).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == _brute(edges)
    assert row["n_triangles"] > 0  # non-degenerate fixture


def test_triangle_count_hub_star(spark):
    # star graph: hub connected to 50 leaves — many wedges, ZERO triangles;
    # plus one closed leaf pair -> exactly one triangle
    edges = [(0, i) for i in range(1, 51)] + [(1, 2)]
    df = spark.createDataFrame(edges, "u long, v long")
    row = triangle_count(df).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (51, 51, 1)


def test_pagerank_random_vs_brute(spark):
    from pipelinewise_spark.functions.graph import pagerank

    rng = random.Random(17)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    # brute-force power iteration, same arithmetic
    adj: dict = {}
    for u, v in canon:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    nodes = sorted(adj)
    n = len(nodes)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(5):
        contrib = {x: 0.0 for x in nodes}
        for u in nodes:
            for v in adj[u]:
                contrib[v] += rank[u] / len(adj[u])
        rank = {x: (1.0 - 0.85) / n + 0.85 * contrib[x] for x in nodes}
    df = spark.createDataFrame(list(canon), "u long, v long")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, "u", "v").collect()
    }
    assert set(got) == set(nodes)
    for x in nodes:
        assert abs(got[x] - rank[x]) < 1e-12, x
    assert abs(sum(got.values()) - 1.0) < 1e-9  # rank mass conserved


def test_pagerank_skew_salted_matches_plain(spark):
    """90 % of edges point into one celebrity node: the auto-detected
    skew-hardened plan (broadcast hot-source join + salted two-level dst
    aggregate) must reproduce the plain plan's ranks to well inside the
    query contract's 9-dp round."""
    from pipelinewise_spark.functions.graph import pagerank

    rnd = random.Random(7)
    edges = [(i, 0) for i in range(1, 181)]  # hub: 90 % of edges
    edges += [(rnd.randrange(1, 60), rnd.randrange(60, 120)) for _ in range(20)]
    df = spark.createDataFrame(edges, "u long, v long")

    plain = {
        r["node"]: r["rank"]
        for r in pagerank(df, "u", "v", skew_salt=None).collect()
    }
    salted = {
        r["node"]: r["rank"]
        for r in pagerank(df, "u", "v", skew_salt=8, skew_threshold=4.0).collect()
    }
    auto = {
        r["node"]: r["rank"]
        for r in pagerank(df, "u", "v", skew_salt="auto", skew_threshold=4.0).collect()
    }
    assert set(plain) == set(salted) == set(auto)
    for x in plain:
        assert abs(plain[x] - salted[x]) < 1e-12, x
        assert abs(plain[x] - auto[x]) < 1e-12, x
    assert abs(sum(salted.values()) - 1.0) < 1e-9


def test_pagerank_skew_plan_shape(spark):
    """Plan pin for the hardened iteration: the hot-source slice joins by
    BROADCAST (no shuffle concentration of a hot key), and the destination
    aggregate is two-level — a partial keyed by (t, __salt) under the
    final groupBy(t) — so a hot destination's final fan-in is bounded by
    the salt shard count, not its in-degree."""
    from pipelinewise_spark.functions.graph import _iteration_contribs

    edges = [(i, 0) for i in range(1, 50)]
    e = spark.createDataFrame(edges, "s long, t long").withColumn(
        "deg", F.lit(1).cast("long")
    )
    ranks = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .withColumn("rank", F.lit(0.01))
    )
    contribs = _iteration_contribs(e, ranks, hot=[0], salt_n=8)
    plan = contribs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "__salt" in plan
    # two-level: at least two aggregate exchanges keyed differently
    assert plan.count("HashAggregate") >= 4  # partial+final x two levels

    # the salted partial genuinely shards the hot destination: node 0's
    # partial rows outnumber 1 (no single-reducer fan-in of its in-degree)
    partial_rows = (
        e.join(ranks, e.s == ranks.node)
        .select("t", (F.col("rank") / F.col("deg")).alias("__c"))
        .repartition(8)
        .withColumn(
            "__salt",
            F.pmod(F.hash("t", F.spark_partition_id()), F.lit(8)),
        )
        .groupBy("t", "__salt")
        .count()
        .filter(F.col("t") == 0)
        .count()
    )
    assert partial_rows > 1
