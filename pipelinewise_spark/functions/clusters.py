"""Duplicate-cluster resolution — connected components over near-dup pairs.

Pairwise near-dup detection (MinHash/Jaccard) yields edges; dedup needs
*clusters* (keep one representative per component). Min-label propagation:
every node repeatedly adopts the smallest id reachable over an edge until a
fixpoint — O(diameter) joins, each a hash shuffle on the node id. Dedup
graphs are shallow (near-dup clusters are small and dense), so the loop
converges in a handful of iterations; each iteration is a pair of
broadcast-or-shuffle joins that scale linearly with the edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) — component = min node id in the connected
    component. ``pairs`` is an undirected edge list."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        # cut the lineage: edges feed every iteration's joins — without this
        # the (expensive) pair-generation upstream re-executes per iteration.
        # Lazy: the first iteration's convergence probe materializes it, so
        # no standalone checkpoint job runs.
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        # each node adopts min(own label, neighbors' labels); the change
        # flag rides along so convergence needs no extra join — one agg
        # over the (already checkpointed) result per iteration
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_component = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        )
        stepped = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                new_component.alias("component"),
                (new_component != F.col("component")).alias("__changed"),
            )
            # lazy checkpoint: the convergence probe below is the first
            # action, so ONE job per iteration both advances the labels and
            # answers "did anything change" — an eager checkpoint would run
            # a second, result-discarding job every iteration
            .localCheckpoint(eager=False)
        )
        labels = stepped.select("node", "component")
        if not stepped.agg(F.max("__changed")).collect()[0][0]:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(node, component, is_representative) — keep rows where
    ``is_representative`` for a deduplicated corpus."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.withColumn(
        "is_representative", F.col("node") == F.col("component")
    )


def cluster_aware_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    valid_percent: int = 10,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/validation split with NO near-duplicate leakage: every near-dup
    component lands wholly on one side, chosen by a deterministic hash of
    the component id (md5 bucket, engine-portable — the same device as
    curation.uniform_hash_bucket). A doc-level random split leaks: a
    training doc's near-duplicate in the validation set inflates eval.
    Adds ``component`` and ``split`` ('train' | 'valid').

    Corpus-side cost: one left join against the (edge-scale) component map
    plus a narrow projection — same shape as resolve_duplicates.
    """
    cc = connected_components(pairs, id_a, id_b).withColumnRenamed(
        "node", id_col
    )
    joined = docs.join(cc, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("component").cast("string")), 1, 8), 16, 10
        ).cast("long") % 100
    )
    return joined.withColumn(
        "split",
        F.when(bucket < valid_percent, F.lit("valid")).otherwise(
            F.lit("train")
        ),
    )


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Canonical-document selection: every doc gets its near-dup component
    (docs in no pair are their own singleton component) and ``keep`` marks
    the best doc per component — highest ``quality_col``, smallest id on
    ties (deterministic). This is the step an actual corpus dedup runs
    after pair detection: drop ``keep = false`` rows.

    Plan shape: components come from the pair graph only (tiny vs the
    corpus); the corpus-side work is ONE left join on the id (components
    broadcast when small) and ONE window shuffle keyed by component —
    no all-pairs anything, scales with corpus + edges.
    """
    cc = connected_components(pairs, id_a, id_b).withColumnRenamed(
        "node", id_col
    )
    joined = docs.join(cc, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    w = (
        Window.partitionBy("component")
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .withColumn("keep", F.col("__rk") == 1)
        .drop("__rk")
    )
