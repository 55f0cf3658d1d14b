"""Record linkage / entity resolution across two sources.

The classic warehouse-consolidation op a replication pipeline feeds (the
reference moves CRM-ish tables between systems; deciding which rows in two
systems are the SAME entity is the step after). Fellegi–Sunter shaped, but
with INTEGER agreement weights so scores are engine-portable and
hash-exact: each feature contributes ``weight`` iff its predicate holds
(exact equality, or Levenshtein distance within a cap — both JVM-built-in
in Spark and native in DuckDB), the candidate space is bounded by equality
BLOCKING (never all-pairs, same shape as the edit-distance dedup join),
and each right record resolves to its best-scoring left match with
deterministic (score DESC, key ASC) tie-breaks.

Scale: the blocked join is one shuffle on the block key; per-block cost is
|block_a| x |block_b|, controlled by the caller's blocking choice (compose
several block passes + union for recall, like MinHash bands). Scoring is
pure Column arithmetic; best-match is a partial-aggregatable
min(struct(-score, key)) — no window sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def feature_exact(a_col: str, b_col: str, weight: int) -> dict:
    return {"a": a_col, "b": b_col, "kind": "exact", "weight": weight}


def feature_edit(a_col: str, b_col: str, weight: int, max_dist: int) -> dict:
    return {
        "a": a_col,
        "b": b_col,
        "kind": "edit",
        "weight": weight,
        "max_dist": max_dist,
    }


def feature_band(a_col: str, b_col: str, weight: int, tol) -> dict:
    """Numeric proximity: |a − b| <= tol (exact under DECIMAL inputs)."""
    return {
        "a": a_col,
        "b": b_col,
        "kind": "band",
        "weight": weight,
        "tol": tol,
    }


def _score(features: Sequence[dict]) -> Column:
    s = F.lit(0)
    for f in features:
        a, b = F.col(f"__a.{f['a']}"), F.col(f"__b.{f['b']}")
        if f["kind"] == "exact":
            hit = a == b
        elif f["kind"] == "band":
            hit = F.abs(a - b) <= F.lit(f["tol"])
        else:
            hit = F.levenshtein(a, b) <= f["max_dist"]
        s = s + F.when(hit, F.lit(int(f["weight"]))).otherwise(F.lit(0))
    return s.cast("long")


def link_records(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    blocks: Sequence[tuple[str, str]],
    features: Sequence[dict],
    threshold: int,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """Best-scoring left match per right record.

    ``blocks``: (left_col, right_col) equality pairs — candidates must
    agree on ALL of them. ``features``: see :func:`feature_exact` /
    :func:`feature_edit`. Returns (right_key, left_key, score) for right
    records whose best candidate clears ``threshold``; right records with
    no candidate or only sub-threshold candidates are absent (anti-join
    against this result finds them).

    ``max_block_pairs`` is the dense-block guard every production
    Fellegi-Sunter run needs: a block key shared by thousands of records
    on both sides (common names, default dates) costs |A|x|B| — measured
    30x wall-clock at 10x data on a replica-dense corpus (SCALE.md r9).
    Blocks whose candidate-pair product exceeds the cap are SKIPPED
    entirely: an oversized block means the blocking key carries no
    discriminating signal there, and recall for its records belongs to a
    DIFFERENT blocking pass (compose several + union, like MinHash
    bands), not to a quadratic scan."""
    a = left.alias("__a")
    b = right.alias("__b")
    if max_block_pairs is not None:
        bk_a = [F.col(la) for la, _ in blocks]
        bk_b = [F.col(rb) for _, rb in blocks]
        ca = left.groupBy(*bk_a).agg(F.count("*").alias("__ca"))
        cb = right.groupBy(*bk_b).agg(F.count("*").alias("__cb"))
        allowed = (
            ca.join(
                cb,
                [
                    ca[la].eqNullSafe(cb[rb])
                    for (la, _), (_, rb) in zip(blocks, blocks)
                ],
            )
            .filter(F.col("__ca") * F.col("__cb") <= int(max_block_pairs))
            .select(*[ca[la].alias(la) for la, _ in blocks])
        )
        left = left.join(allowed, [la for la, _ in blocks], "left_semi")
        right = right.join(
            allowed.toDF(*[rb for _, rb in blocks]),
            [rb for _, rb in blocks],
            "left_semi",
        )
        a = left.alias("__a")
        b = right.alias("__b")
    cond = None
    for la, rb in blocks:
        c = F.col(f"__a.{la}") == F.col(f"__b.{rb}")
        cond = c if cond is None else (cond & c)
    scored = (
        a.join(b, cond)
        .select(
            F.col(f"__b.{right_key}").alias("right_key"),
            F.col(f"__a.{left_key}").alias("left_key"),
            _score(features).alias("score"),
        )
        .filter(F.col("score") >= F.lit(int(threshold)))
    )
    # best match: min(struct(-score, left_key)) == (score DESC, key ASC)
    best = scored.groupBy("right_key").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), "left_key")).alias("__m")
    )
    return best.select(
        "right_key",
        F.col("__m.left_key").alias("left_key"),
        (-F.col("__m.ns")).cast("long").alias("score"),
    )
