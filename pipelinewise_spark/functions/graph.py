"""Graph metrics over edge lists — degree-oriented triangle counting.

Triangles (co-occurrence cliques of 3) are the standard graph-shaped
quality signal over similarity / co-purchase edges.  The naive 3-way
self-join enumerates every *wedge* (2-path) — a hub of degree d emits
d*(d-1)/2 wedges, so one celebrity node can dominate the whole job.  The
classic MR fix (Suri & Vassilvitskii, WWW'11) orients each undirected
edge from the lower-(degree, id) endpoint to the higher one: the
orientation is acyclic, every triangle then has EXACTLY ONE node with two
out-edges, and out-degrees are bounded by O(sqrt(m)) — wedge volume drops
from sum(d^2) to O(m^1.5), the provable optimum.

Shuffle shape: two node-keyed joins to attach degrees, one self-join on
the wedge apex, one equi-join to close wedges.  No broadcast of
node-sized state; everything scales with edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """One row (n_nodes, n_edges, n_triangles) for the undirected simple
    graph in ``edges`` (self-loops and duplicate/reversed edges removed).
    Each triangle counts once."""
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient low (deg, id) -> high (deg, id); total order, so acyclic
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("t_deg"),
        )
        .localCheckpoint(eager=False)
    )
    # wedges at the apex s: unordered pairs of out-neighbors, ordered by the
    # SAME (deg, id) total order the orientation used — the closing edge of
    # a closed wedge is then guaranteed to be oriented a -> b
    a = oriented.select("s", F.col("t").alias("a"), F.col("t_deg").alias("a_deg"))
    b = oriented.select("s", F.col("t").alias("b"), F.col("t_deg").alias("b_deg"))
    wedges = a.join(b, "s").filter(
        (F.col("a_deg") < F.col("b_deg"))
        | ((F.col("a_deg") == F.col("b_deg")) & (F.col("a") < F.col("b")))
    )
    closing = oriented.select(
        F.col("s").alias("a"), F.col("t").alias("b"), F.lit(1).alias("__closed")
    )
    tri = wedges.join(closing, ["a", "b"]).agg(
        F.count("*").alias("n_triangles")
    )
    counts = e.agg(
        F.count("*").alias("n_edges"),
    ).crossJoin(deg.agg(F.count("*").alias("n_nodes")))
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


def _iteration_contribs(
    src_deg: DataFrame, ranks: DataFrame, hot: list, salt_n: int
) -> DataFrame:
    """One power-iteration contribution pass: ranks onto edge sources,
    summed per destination. With a non-empty ``hot`` list the plan is the
    skew-hardened shape pagerank's docstring describes: hot sources take
    a broadcast slice of the ranks (never a shuffle concentration), and
    the destination aggregate runs as a salted two-level partial."""
    if not hot:
        return (
            src_deg.join(ranks, src_deg.s == ranks.node)
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
    hot_ranks = ranks.filter(F.col("node").isin(hot))
    joined = (
        src_deg.filter(~F.col("s").isin(hot))
        .join(ranks, src_deg.s == ranks.node)
        .select("t", (F.col("rank") / F.col("deg")).alias("__c"))
        .unionByName(
            src_deg.filter(F.col("s").isin(hot))
            .join(F.broadcast(hot_ranks), src_deg.s == F.col("node"))
            .select("t", (F.col("rank") / F.col("deg")).alias("__c"))
        )
    )
    partial = joined.withColumn(
        "__salt",
        F.pmod(F.hash("t", F.spark_partition_id()), F.lit(salt_n)),
    ).groupBy("t", "__salt").agg(F.sum("__c").alias("__p"))
    return partial.groupBy(F.col("t").alias("node")).agg(
        F.sum("__p").alias("contrib")
    )


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iterations: int = 5,
    damping: float = 0.85,
    directed: bool = False,
    skew_salt: int | str | None = "auto",
    skew_threshold: float = 64.0,
    max_hot_nodes: int = 1024,
) -> DataFrame:
    """(node, rank) after a FIXED number of power iterations — fixed so the
    result is deterministic and oracle-reproducible (convergence-threshold
    stopping would make the output depend on float noise).  Undirected
    input symmetrizes the edges, which also removes dangling nodes (every
    node then has out-degree >= 1, so no rank mass leaks).

    Per iteration: one shuffle join (ranks onto edge sources — edges are
    pre-keyed by src, ranks arrive hash-partitioned the same way from the
    previous aggregate) + one aggregate on dst.  Ranks/degrees are
    node-sized; edges dominate, as they must.  The iteration count is the
    only sequential dimension — 5 iterations on 100 TB of edges is 5
    edge-scans, with lineage cut per step so failure recovery replays one
    iteration, not the whole chain.

    Skew hardening (``skew_salt="auto"``, the default): real graphs are
    power-law — one celebrity node can own a third of the edges.  One
    node-sized degree scan up front finds nodes whose degree exceeds
    ``skew_threshold`` x the mean (at most ``max_hot_nodes``, metadata-
    scale by construction).  When any exist, each iteration (a) routes
    hot-SOURCE edges through a broadcast join of just the hot nodes'
    ranks — the rank-onto-edges shuffle join never concentrates a hot
    key's edge volume on one task — and (b) runs the dst aggregate as a
    salted two-level partial (groupBy(t, salt) then groupBy(t)), so the
    final combine of a hot DESTINATION fans in over salt shards.  Results
    are identical up to float summation order (callers round; the
    registered query pins 9 dp against the unrolled-SQL oracle).  Pass an
    int to force that many salt shards, or None/0 to disable."""
    e = _canonical_edges(edges, src, dst)
    e2 = (
        e.select(F.col("u").alias("s"), F.col("v").alias("t"))
        if directed
        else e.select(F.col("u").alias("s"), F.col("v").alias("t")).union(
            e.select(F.col("v").alias("s"), F.col("u").alias("t"))
        )
    ).localCheckpoint(eager=False)
    outdeg = e2.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("deg")
    )
    nodes = (
        e2.select(F.col("s").alias("node"))
        .union(e2.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.agg(F.count("*").alias("cnt"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("cnt")).alias("rank")
    )
    src_deg = e2.join(outdeg, e2.s == outdeg.node).select(
        "s", "t", "deg"
    ).localCheckpoint(eager=False)

    hot: list = []
    salt_n = 0
    if skew_salt:
        # node-sized, once: degree table is already answer-scale. A node
        # is hot when its degree exceeds skew_threshold x mean; by
        # construction at most N/threshold nodes qualify, and the
        # max_hot_nodes cap keeps the collected list (and the broadcast
        # rank slice) driver-safe even on adversarial inputs.
        deg_all = (
            e2.select(F.col("s").alias("node"))
            .union(e2.select(F.col("t").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        mean_d = deg_all.agg(F.avg("d").alias("m")).collect()[0]["m"] or 0.0
        hot = [
            r["node"]
            for r in deg_all.filter(
                F.col("d") > F.lit(float(skew_threshold) * mean_d)
            )
            .orderBy(F.col("d").desc())
            .limit(max_hot_nodes)
            .collect()
        ]
        salt_n = (
            skew_salt
            if isinstance(skew_salt, int)
            else min(32, max(8, e2.sparkSession.sparkContext.defaultParallelism))
        )

    for _ in range(iterations):
        contribs = _iteration_contribs(src_deg, ranks, hot, salt_n)
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("cnt")
                    + F.lit(damping)
                    * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
