"""Unit tests for the r7 continuation operators: pointer-jumping hierarchy
resolution (operators/hierarchy.py) and market-basket co-occurrence
(functions/basket.py). Both are cross-checked against brute-force Python
references on randomized inputs; the hierarchy test also proves the
log-depth claim (a 1000-deep chain resolves within 12 rounds, which a
one-level-per-round walk cannot do)."""

from __future__ import annotations

import itertools
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.functions.basket import cooccurrence_pairs
from pipelinewise_spark.operators.hierarchy import (
    HierarchyCycleError,
    resolve_hierarchy,
    rollup_by_root,
)


def _brute_resolve(parents: dict[int, int | None]) -> dict[int, tuple[int, int]]:
    out = {}
    for node in parents:
        cur, d = node, 0
        while parents[cur] is not None:
            cur = parents[cur]
            d += 1
        out[node] = (cur, d)
    return out


def test_resolve_hierarchy_random_forest(spark):
    rng = random.Random(7)
    # forest: node i's parent is a strictly smaller id (acyclic by
    # construction), ~20% roots
    parents = {0: None}
    for i in range(1, 400):
        parents[i] = None if rng.random() < 0.2 else rng.randrange(i)
    df = spark.createDataFrame(
        [(k, v) for k, v in parents.items()], "id long, parent long"
    )
    got = {
        r["id"]: (r["root_id"], r["depth"])
        for r in resolve_hierarchy(df, "id", "parent").collect()
    }
    assert got == _brute_resolve(parents)


def test_resolve_hierarchy_log_depth_chain(spark):
    # a 1000-deep chain converges within 12 rounds (2**12 >= 1000): this
    # can ONLY succeed via path doubling — a walk that climbs one level
    # per round would need 1000
    n = 1000
    rows = [(i, i - 1 if i > 0 else None) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, parent long")
    res = resolve_hierarchy(df, "id", "parent", max_rounds=12)
    got = {r["id"]: (r["root_id"], r["depth"]) for r in res.collect()}
    assert got[n - 1] == (0, n - 1)
    assert got[0] == (0, 0)
    assert len(got) == n


def test_resolve_hierarchy_cycle_raises(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, None)], "id long, parent long"
    )
    with pytest.raises(HierarchyCycleError):
        resolve_hierarchy(df, "id", "parent", max_rounds=8)


def test_rollup_by_root(spark):
    parents = {1: None, 2: 1, 3: 1, 4: 2, 5: None, 6: 5}
    df = spark.createDataFrame(
        [(k, v, float(k)) for k, v in parents.items()],
        "id long, parent long, val double",
    )
    resolved = resolve_hierarchy(df, "id", "parent")
    got = {
        r["root_id"]: (r["n_nodes"], r["max_depth"], r["subtree_value"])
        for r in rollup_by_root(df, resolved, "id", "val").collect()
    }
    assert got == {1: (4, 2, 10.0), 5: (2, 1, 11.0)}


def _brute_pairs(rows, min_item, min_pair):
    baskets = set(rows)
    item_n = Counter(i for _, i in baskets)
    freq = {i for i, n in item_n.items() if n >= min_item}
    by_b: dict = {}
    for b, i in baskets:
        if i in freq:
            by_b.setdefault(b, set()).add(i)
    pair_n = Counter(
        p
        for items in by_b.values()
        for p in itertools.combinations(sorted(items), 2)
    )
    n_baskets = len({b for b, _ in baskets})
    return {
        (a, b): (n, item_n[a], item_n[b], n_baskets)
        for (a, b), n in pair_n.items()
        if n >= min_pair
    }


def test_cooccurrence_pairs_random(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(60), rng.randrange(25)) for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_baskets"],
            r["baskets_a"],
            r["baskets_b"],
            r["n_baskets"],
        )
        for r in cooccurrence_pairs(
            df, "basket", "item", min_item_support=3, min_pair_support=2
        ).collect()
    }
    assert got == _brute_pairs(rows, 3, 2)
    assert got  # non-degenerate fixture


def test_cooccurrence_max_basket_guard(spark):
    # one mega-basket (0) holding every item, plus two small baskets; the
    # guard must drop the mega-basket's pairs but keep the small ones
    rows = [(0, i) for i in range(20)] + [(1, 1), (1, 2), (2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = cooccurrence_pairs(
        df,
        "basket",
        "item",
        min_item_support=1,
        min_pair_support=1,
        max_basket_items=10,
    ).collect()
    assert {(r["item_a"], r["item_b"]) for r in got} == {(1, 2)}
    # the mega-basket still counts toward item/basket totals (the guard
    # bounds the PAIR fan-out, it does not un-observe the basket)
    row = got[0]
    assert (row["pair_baskets"], row["baskets_a"], row["n_baskets"]) == (2, 3, 3)


def test_cooccurrence_prune_is_broadcast(spark):
    df = spark.createDataFrame(
        [(b, i) for b in range(50) for i in range(b % 4)],
        "basket long, item long",
    )
    plan = cooccurrence_pairs(
        df, "basket", "item", min_item_support=2, min_pair_support=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
