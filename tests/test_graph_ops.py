"""Degree-oriented triangle counting (functions/graph.py) vs brute force
on randomized graphs — including duplicate / reversed / self-loop edges
that the canonicalization must absorb."""

from __future__ import annotations

import itertools
import random

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
