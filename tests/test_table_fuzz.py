"""Randomized sequences of table verbs against three invariants.

Hypothesis drives arbitrary interleavings of merge / merge_on_read /
delete_where / update_where / compact / rollback_to / metadata-only
(constraint) commits over a small partitioned ManifestTable, checking
after EVERY verb:

1. ``count_rows()`` (metadata-only) == ``read().count()`` (data scan);
2. ``changes_between(v, head)`` replayed onto the version-v snapshot
   reconstructs the live table exactly, for a random v in history;
3. a pinned early snapshot read is bit-stable across later verbs
   (immutability of published history).

A pure-Python dict fold runs alongside as the semantic oracle for the
live contents, so verb semantics (not just internal consistency) are
pinned. Shrinking gives minimal failing verb sequences.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipelinewise_spark.operators.manifest_table import ManifestTable

KEYS = list(range(12))


def _rows_df(spark, rows: dict[int, float]):
    data = [(k, str(k % 3), v) for k, v in sorted(rows.items())]
    return spark.createDataFrame(data, "k long, p string, v double")


def _read_dict(spark, t: ManifestTable, version=None) -> dict[int, float]:
    return {
        r["k"]: r["v"]
        for r in t.read(spark, version=version).select("k", "v").collect()
    }


VERB = st.sampled_from(
    ["merge", "mor", "delete", "update", "compact", "rollback", "meta"]
)
STEP = st.tuples(
    VERB,
    st.integers(min_value=0, max_value=11),   # key selector / modulus seed
    st.integers(min_value=0, max_value=400),  # value delta
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(STEP, min_size=2, max_size=5), st.randoms())
def test_table_verbs_fuzz_invariants(spark, steps, rnd):
    model: dict[int, float] = {k: float(k) for k in KEYS}
    tmp = tempfile.mkdtemp(prefix="pws_fuzz_")
    t = ManifestTable(os.path.join(tmp, "t"), ["p"])
    t.overwrite(_rows_df(spark, model))
    snapshots: dict[int, dict[int, float]] = {1: dict(model)}

    for verb, sel, delta in steps:
        if verb in ("merge", "mor"):
            touched = {k for k in KEYS if k % 4 == sel % 4} | {sel}
            batch = {k: model.get(k, float(k)) + delta for k in touched}
            bdf = _rows_df(spark, batch)
            if verb == "merge":
                t.merge(spark, bdf, ["k"])
            else:
                t.merge_on_read(spark, bdf, ["k"])
            model.update(batch)
        elif verb == "delete":
            cond = f"k % 5 = {sel % 5}"
            n = t.delete_where(spark, cond)
            dead = [k for k in model if k % 5 == sel % 5]
            assert n == len(dead)
            for k in dead:
                del model[k]
            if n == 0:
                continue  # nothing published; invariants unchanged
        elif verb == "update":
            cond = f"k % 3 = {sel % 3}"
            n = t.update_where(
                spark, cond, {"v": F.col("v") + float(delta)}
            )
            hit = [k for k in model if k % 3 == sel % 3]
            assert n == len(hit)
            for k in hit:
                model[k] += delta
            if n == 0:
                continue
        elif verb == "rollback":
            # restore any earlier snapshot (incl. over DV/MOR commits —
            # the feed must emit resurrection inserts); the fold target
            # becomes that snapshot's contents
            target = sorted(snapshots)[sel % len(snapshots)]
            t.rollback_to(target)
            model = dict(snapshots[target])
        elif verb == "meta":
            # metadata-only commit (constraint publish): parent chain
            # must stay intact and the CDF must emit nothing for it
            t.add_constraint(spark, f"c{sel}_{delta}", "k IS NOT NULL")
        else:
            t.compact(spark, min_files=2)

        head = max(t.versions())
        snapshots[head] = dict(model)

        # 1. metadata count == scan count == model size
        assert t.count_rows() == len(model)
        assert t.read(spark).count() == len(model)
        # semantic oracle: live contents == python fold
        assert _read_dict(spark, t) == model

        # 2. CDF replay from a random retained version
        v_from = rnd.choice(sorted(snapshots))
        feed = t.changes_between(spark, v_from)
        base = dict(snapshots[v_from])
        dels = feed.filter("_change_type = 'delete'") \
            .select("k", "v", "_commit_version").collect()
        ins = feed.filter("_change_type = 'insert'") \
            .select("k", "v", "_commit_version").collect()
        # fold in commit order: deletes of a commit before its inserts
        events: dict[int, list] = {}
        for r in dels:
            events.setdefault(r["_commit_version"], []).append(("d", r))
        for r in ins:
            events.setdefault(r["_commit_version"], []).append(("i", r))
        for v in sorted(events):
            for op, r in sorted(events[v], key=lambda e: e[0]):
                if op == "d":
                    assert base.pop(r["k"]) == r["v"]
                else:
                    base[r["k"]] = r["v"]
        assert base == model, f"CDF replay from v{v_from} diverged"

    # 3. pinned history: v1 is still byte-stable
    assert _read_dict(spark, t, version=1) == snapshots[1]
