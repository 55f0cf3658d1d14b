"""Property-based pins for the r8 operators: each distributed result is
replayed by an independent pure-Python reference on randomized fixtures
(the masking/SCD2 property-test strategy extended to linkage, reconcile,
MMR, and the seasonal rule).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.functions.linkage import (
    feature_band,
    feature_edit,
    feature_exact,
    link_records,
)
from pipelinewise_spark.operators.reconcile import reconcile_diff


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed", [7, 21])
def test_linkage_matches_pure_python_reference(spark, seed):
    rng = random.Random(seed)
    names = ["ann", "anne", "bob", "bobby", "carl", "carla", "dora", "dot"]
    left = [
        (i, rng.choice(names), rng.choice("XY"), float(rng.randint(1, 9)))
        for i in range(30)
    ]
    right = [
        (100 + i, rng.choice(names), rng.choice("XY"), float(rng.randint(1, 9)))
        for i in range(30)
    ]
    ldf = spark.createDataFrame(left, "id long, name string, blk string, bal double")
    rdf = spark.createDataFrame(right, "id long, name string, blk string, bal double")
    feats = [
        feature_exact("name", "name", 300),
        feature_edit("name", "name", 500, max_dist=2),
        feature_band("bal", "bal", 400, 1.0),
    ]
    got = {
        r["right_key"]: (r["left_key"], r["score"])
        for r in link_records(
            ldf, rdf, "id", "id", [("blk", "blk")], feats, 500
        ).collect()
    }

    # pure-Python replay
    want: dict[int, tuple[int, int]] = {}
    for rk, rn, rb, rbal in right:
        best = None
        for lk, ln, lb, lbal in sorted(left):
            if lb != rb:
                continue
            score = (
                (300 if ln == rn else 0)
                + (500 if _lev(ln, rn) <= 2 else 0)
                + (400 if abs(lbal - rbal) <= 1.0 else 0)
            )
            if score < 500:
                continue
            if best is None or score > best[1]:
                best = (lk, score)
        if best:
            want[rk] = best
    assert got == want


@pytest.mark.parametrize("seed", [3, 13])
def test_reconcile_diff_random_corruptions(spark, seed):
    rng = random.Random(seed)
    src_rows = [(i, f"v{i}") for i in range(200)]
    missing = set(rng.sample(range(200), 5))
    modified = set(rng.sample([i for i in range(200) if i not in missing], 5))
    extra = set(range(500, 505))
    tgt_rows = [
        (i, f"MOD{i}" if i in modified else v)
        for i, v in src_rows
        if i not in missing
    ] + [(i, f"v{i}") for i in extra]
    s = spark.createDataFrame(src_rows, "id long, v string")
    t = spark.createDataFrame(tgt_rows, "id long, v string")
    canon = [F.col("id").cast("string"), F.col("v")]
    got = {
        r["key"]: r["status"] for r in reconcile_diff(s, t, "id", canon).collect()
    }
    want = (
        {i: "missing_in_target" for i in missing}
        | {i: "modified" for i in modified}
        | {i: "missing_in_source" for i in extra}
    )
    assert got == want


def test_mmr_each_pick_is_stepwise_argmax(spark):
    """Replay the greedy: at every rank r, the picked candidate must have
    the maximal (score, -id) among candidates not yet selected, computed
    from the SAME rounded rel/sim values the operator consumed."""
    from pipelinewise_spark.functions import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    pool, k, lam = 10, 4, 0.7
    rel = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in S.cosine_topk(emb, queries, "vec_id", "embedding", k=pool).collect()
    }
    mmr = S.mmr_diversify_topk(
        emb, queries, "vec_id", "embedding", k=k, pool=pool, lam=lam
    ).collect()
    # pairwise sims among each query's pool, same rounded cosine
    by_q: dict[int, list[int]] = {}
    for (q, n) in rel:
        by_q.setdefault(q, []).append(n)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 10_000).collect()
    }

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        dp = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        return round(dp / (na * nb), 6)

    sel: dict[int, list[int]] = {}
    for r in sorted(mmr, key=lambda r: (r["query_id"], r["mmr_rank"])):
        q, picked = r["query_id"], r["neighbor_id"]
        chosen = sel.setdefault(q, [])
        best_id, best_score = None, None
        for c in sorted(by_q[q]):
            if c in chosen:
                continue
            div = max((cos(c, s) for s in chosen), default=0.0)
            score = lam * rel[(q, c)] - (1 - lam) * div
            if best_score is None or score > best_score:
                best_id, best_score = c, score
        assert picked == best_id, (q, r["mmr_rank"], picked, best_id)
        chosen.append(picked)


def test_seasonal_rule_matches_pure_python(spark):
    rng = random.Random(5)
    rows = [
        (s, i, rng.randint(50, 150)) for s in ("a", "b", "c") for i in range(20)
    ]
    from pipelinewise_spark.operators.anomaly import seasonal_anomalies

    df = spark.createDataFrame(rows, "season string, i int, cnt long")
    got = {
        (r["season"], r["i"]): (r["baseline_median"], r["mad"], r["is_anomaly"])
        for r in seasonal_anomalies(df, "season", "cnt").collect()
    }

    import statistics

    for s in ("a", "b", "c"):
        vals = [c for (ss, _, c) in rows if ss == s]
        med = round(float(statistics.median(vals)), 6)
        mad = round(float(statistics.median([abs(v - med) for v in vals])), 6)
        for (ss, i, c) in rows:
            if ss != s:
                continue
            g = got[(s, i)]
            assert g[0] == med and g[1] == mad
            assert g[2] == (abs(c - med) > 3.0 * mad + 0.01 * med)
