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


# ------------------------------------------- two interleaved writers (r8)

W_VERB = st.sampled_from(["merge", "update", "delete", "meta", "compact"])
W_STEP = st.tuples(
    W_VERB,
    st.integers(min_value=0, max_value=11),
    st.integers(min_value=1, max_value=400),
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(W_STEP, min_size=2, max_size=3),
    st.lists(W_STEP, min_size=2, max_size=3),
)
def test_two_writer_interleaved_fuzz(spark, steps_a, steps_b):
    """Two ManifestTable handles racing randomized verbs round-by-round
    (a threading.Barrier aligns each round so publishes genuinely
    contend). Under optimistic concurrency + commit_with_retries every
    verb must eventually land: no silently lost commit (version count ==
    successful publishes), CDF replay from v1 reconstructs the live
    table exactly, metadata count == scan count, pinned history stays
    bit-stable. This is the concurrent analog of the reference's
    concurrent `SWAP WITH` risk surface
    (fastsync/commons/target_snowflake.py:448-469)."""
    import threading

    from pipelinewise_spark.operators.manifest_table import (
        commit_with_retries,
    )

    model0 = {k: float(k) for k in KEYS}
    tmp = tempfile.mkdtemp(prefix="pws_fuzz2_")
    root = os.path.join(tmp, "t")
    t = ManifestTable(root, ["p"])
    t.overwrite(_rows_df(spark, model0))

    rounds = max(len(steps_a), len(steps_b))
    barrier = threading.Barrier(2)
    published = {"a": 0, "b": 0}
    errors: list[BaseException] = []

    def runner(tag: str, steps):
        handle = ManifestTable(root, ["p"])
        try:
            for rnd_i in range(rounds):
                barrier.wait(timeout=120)
                if rnd_i >= len(steps):
                    continue
                verb, sel, delta = steps[rnd_i]

                def apply(verb=verb, sel=sel, delta=delta):
                    if verb == "merge":
                        batch = {
                            k: float(k + delta)
                            for k in KEYS
                            if k % 4 == sel % 4
                        }
                        handle.merge(spark, _rows_df(spark, batch), ["k"])
                        return 1
                    if verb == "update":
                        return (
                            1
                            if handle.update_where(
                                spark,
                                f"k % 3 = {sel % 3}",
                                {"v": F.col("v") + float(delta)},
                            )
                            else 0
                        )
                    if verb == "delete":
                        return (
                            1
                            if handle.delete_where(spark, f"k = {sel}")
                            else 0
                        )
                    if verb == "meta":
                        handle.add_constraint(
                            spark, f"c_{tag}_{rnd_i}", "k IS NOT NULL"
                        )
                        return 1
                    return 1 if handle.compact(spark, min_files=2) else 0

                published[tag] += commit_with_retries(apply, attempts=10)
        except BaseException as e:  # noqa: BLE001 — surface to main thread
            errors.append(e)
            # release the peer so the test fails fast instead of hanging
            barrier.abort()

    ta = threading.Thread(target=runner, args=("a", steps_a))
    tb = threading.Thread(target=runner, args=("b", steps_b))
    ta.start(), tb.start()
    ta.join(timeout=600), tb.join(timeout=600)
    assert not errors, f"writer died: {errors[0]!r}"

    # no lost commits: overwrite (v1) + every successful publish
    assert len(t.versions()) == 1 + published["a"] + published["b"]

    # CDF replay from the initial snapshot reconstructs the live table
    live = _read_dict(spark, t)
    feed = t.changes_between(spark, 1)
    base = dict(model0)
    events: dict[int, list] = {}
    for r in feed.select("k", "v", "_change_type", "_commit_version").collect():
        events.setdefault(r["_commit_version"], []).append(r)
    for v in sorted(events):
        for r in sorted(events[v], key=lambda r: r["_change_type"]):
            if r["_change_type"] == "delete":
                assert base.pop(r["k"]) == r["v"]
            else:
                base[r["k"]] = r["v"]
    assert base == live, "CDF replay diverged after concurrent writers"

    # metadata count == scan count; pinned v1 unchanged
    assert t.count_rows() == len(live)
    assert _read_dict(spark, t, version=1) == model0


def test_concurrent_first_appends_exactly_one_wins(spark, tmp_path):
    """N threads race to CREATE the same table with one append each: the
    EXPECT_ABSENT sentinel guarantees exactly one blind first commit; the
    losers either conflict (and retry as ordinary appends here) or land
    AFTER the winner with its files carried — no batch may ever vanish."""
    import os
    import threading

    from pipelinewise_spark.operators.manifest_table import (
        CommitConflict,
        ManifestTable,
    )

    path = os.path.join(str(tmp_path), "race")
    n_writers = 4
    barrier = threading.Barrier(n_writers, timeout=120)
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            t = ManifestTable(path, [])
            df = spark.range(i * 100, i * 100 + 10).selectExpr("id AS k")
            barrier.wait()
            for _ in range(12):  # retry conflicts like a real caller
                try:
                    t.append(df)
                    return
                except CommitConflict:
                    continue
            raise AssertionError(f"writer {i} never committed")
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, f"writer died: {errors[0]!r}"

    t = ManifestTable(path, [])
    rows = {r["k"] for r in t.read(spark).collect()}
    want = {
        k for i in range(n_writers) for k in range(i * 100, i * 100 + 10)
    }
    assert rows == want, "a concurrent first append lost a batch"
    assert len(t.versions()) == n_writers
