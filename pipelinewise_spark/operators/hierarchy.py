"""Hierarchy resolution — transitive closure over parent pointers.

Dimension tables frequently carry self-referencing hierarchies (category
trees, org charts, bill-of-materials) that SQL engines walk with
``WITH RECURSIVE``.  Spark has no recursive CTE, and the naive translation
— one join per level — costs O(depth) shuffles and never terminates on bad
data.  This module resolves every node's root and depth with **pointer
jumping** (path doubling): each round replaces a node's ancestor pointer
with the pointer's own pointer, doubling the distance covered, so a tree of
depth d resolves in ceil(log2 d) self-joins instead of d.  Each round is
one hash-shuffle join on the node id plus a single-row convergence
aggregate (one job per round, same discipline as
``functions.clusters.connected_components``).

Scale: the state is one row per node (id, ptr, depth) — corpus-linear, no
path enumeration, no explosion with fan-out.  A 20-level hierarchy over a
billion rows resolves in 5 rounds of billion-row joins rather than 20.

Reference parity: the reference pipelines flatten hierarchies in the
warehouse after load (recursive SQL on the target); this brings the same
capability into the engine. Cf. transform semantics in
pipelinewise/cli/pipelinewise.py (post-load SQL hooks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HierarchyCycleError(ValueError):
    """Raised when pointer jumping fails to converge — the parent graph
    contains a cycle (or is deeper than 2**max_rounds)."""


def resolve_hierarchy(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    max_rounds: int = 40,
) -> DataFrame:
    """(id, root_id, depth) for every node of a parent-pointer forest.

    ``parent_col`` must be NULL for roots and reference an existing
    ``id_col`` otherwise (rows whose parent is missing from ``nodes`` are
    dropped by the closure join — same contract as an inner recursive CTE).
    Raises :class:`HierarchyCycleError` if the graph has a cycle; with
    ``max_rounds=40`` any acyclic chain up to 2**40 deep converges first,
    so non-convergence is a cycle, not a depth limit.
    """
    state = (
        nodes.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(parent_col), F.col(id_col)).alias("ptr"),
            F.when(F.col(parent_col).isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("depth"),
        )
        # cut lineage: every round joins state to itself; without this the
        # upstream scan re-executes 2x per round. Lazy — the first round's
        # convergence probe materializes it.
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds):
        hop = state.select(
            F.col("id").alias("h_id"),
            F.col("ptr").alias("h_ptr"),
            F.col("depth").alias("h_depth"),
        )
        stepped = (
            state.join(hop, state.ptr == hop.h_id)
            .select(
                "id",
                F.col("h_ptr").alias("ptr"),
                (F.col("depth") + F.col("h_depth")).alias("depth"),
                # a root's self-pointer contributes h_depth=0: settled rows
                # stop moving, and the flag rides the same job as the step
                (F.col("h_depth") > 0).alias("__moved"),
            )
            .localCheckpoint(eager=False)
        )
        state = stepped.select("id", "ptr", "depth")
        if not stepped.agg(F.max("__moved")).collect()[0][0]:
            return state.select(
                "id", F.col("ptr").alias("root_id"), "depth"
            )
    raise HierarchyCycleError(
        f"parent graph did not converge in {max_rounds} pointer-jumping "
        "rounds — it contains a cycle"
    )


def rollup_by_root(
    nodes: DataFrame,
    resolved: DataFrame,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-root aggregate over a resolved hierarchy: subtree size, max
    depth, and the sum of ``value_col`` across the subtree.  One join on
    the node id (same key both sides) + one shuffle on root_id — the
    row count is #roots, never #nodes."""
    joined = resolved.join(
        nodes.select(F.col(id_col).alias("id"), F.col(value_col)), "id"
    )
    return joined.groupBy("root_id").agg(
        F.count("*").alias("n_nodes"),
        F.max("depth").alias("max_depth"),
        F.sum(value_col).alias("subtree_value"),
    )
