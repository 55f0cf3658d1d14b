"""Randomized equivalence: for seeded random bases and change feeds
(inserts, deletes, in-group and group-moving updates, groups emptying out),
the incremental fold must equal a full recompute — the DBSP delta-rule
invariant, checked end-to-end through Spark plans."""

from __future__ import annotations

import random
from decimal import Decimal

from pipelinewise_spark.operators.incremental_agg import (
    apply_change_feed,
    build_aggregate,
)


def _rows(df):
    out = []
    for r in df.collect():
        out.append(
            tuple(
                float(v) if isinstance(v, Decimal) else v for v in r
            )
        )
    return sorted(out, key=repr)


def test_random_change_feeds_match_recompute(spark):
    groups = ["a", "b", "c", "d", None]
    for seed in range(5):
        rng = random.Random(seed)
        base = {
            i: (rng.choice(groups), round(rng.uniform(-50, 50), 3))
            for i in range(rng.randint(3, 25))
        }
        base_rows = [(k, g, v) for k, (g, v) in base.items()]
        mv = build_aggregate(
            spark.createDataFrame(base_rows, "id long, grp string, val double"),
            ["grp"], {"total": "val"},
        )

        state = dict(base)
        changes = []
        next_id = max(base) + 1
        for _ in range(rng.randint(1, 20)):
            op = rng.choice(["i", "u", "d"])
            if op == "i" or not state:
                g, v = rng.choice(groups), round(rng.uniform(-50, 50), 3)
                changes.append(("i", None, None, g, v))
                state[next_id] = (g, v)
                next_id += 1
            elif op == "d":
                k = rng.choice(list(state))
                og, ov = state.pop(k)
                changes.append(("d", og, ov, None, None))
            else:
                k = rng.choice(list(state))
                og, ov = state[k]
                ng = rng.choice(groups)  # may move groups
                nv = round(rng.uniform(-50, 50), 3)
                changes.append(("u", og, ov, ng, nv))
                state[k] = (ng, nv)

        out = apply_change_feed(
            mv,
            spark.createDataFrame(
                changes,
                "op string, old_grp string, old_val double, "
                "new_grp string, new_val double",
            ),
            ["grp"], {"total": "val"},
        )
        final_rows = [(k, g, v) for k, (g, v) in state.items()]
        if final_rows:
            expect = build_aggregate(
                spark.createDataFrame(
                    final_rows, "id long, grp string, val double"
                ),
                ["grp"], {"total": "val"},
            )
            assert _rows(out) == _rows(expect), f"seed {seed}"
        else:
            assert out.count() == 0, f"seed {seed}"
