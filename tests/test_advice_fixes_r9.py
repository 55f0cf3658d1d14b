"""Round-9 ADVICE fixes, pinned by test.

1. _commit_lock ownership re-check: a holder whose lock was timed out and
   broken while it stalled inside the critical section raises
   CommitConflict at the pointer swap instead of silently orphaning the
   breaker's commit (the resumed holder's manifest got a LATER number, so
   the create-exclusive safety net alone would not have fired).
2. reconcile bucketing accepts non-integral keys: string/UUID primary
   keys bucket via xxhash64 instead of failing/null-bucketing in pmod;
   integral keys keep the oracle-reproducible direct pmod.
3. kmeans_exact magnitude guard: a cluster whose member count exceeds the
   exact-arithmetic budget (DECIMAL(38,0) cross-multiply headroom + the
   float64 2^53 exactness bound) raises loudly instead of silently
   misassigning via Spark's NULL-on-overflow decimals.
4. MetaFS.write_text_exclusive on a filesystem without store-side
   conditional PUT warns (RuntimeWarning, once) that exclusive creates
   are TOCTOU-racy.
5. Protobuf map with message-typed values: an entry omitting the value
   decodes to an empty message {} (MessageToDict contract), not None.

Plus the kernel-equivalence pin for the r9 k-means Arrow rewrite:
_argmin_udf (numpy fast path + exact-int fallback) computes the identical
assignment to _argmin_cluster (the interpreted Catalyst fold) on a fuzz
corpus engineered to include exact ties and near-ties.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from pipelinewise_spark.operators.manifest_table import (
    CommitConflict,
    ManifestTable,
)
from pipelinewise_spark.streaming.serialization import (
    decode_message,
    parse_proto,
)

# ------------------------------------------- 1. lock ownership re-check


def test_broken_lock_holder_cannot_swap_pointer(tmp_path, spark):
    """Simulate the ADVICE race: writer A enters the critical section and
    stalls; its lock is timed out and broken; writer B commits. When A
    resumes, its (later-numbered) create-exclusive manifest write would
    succeed — the ownership re-check must abort the pointer swap with
    CommitConflict, and B's commit must remain head."""
    root = str(tmp_path / "t")
    t = ManifestTable(root, [])
    df = spark.range(3).select(F.col("id").alias("k"))
    t.overwrite(df)
    head_before = t.current_manifest_name()

    # Reproduce the post-break interleaving deterministically: A holds a
    # lock that a contender has ALREADY broken and replaced (B's token),
    # then A runs _publish's critical section body. We emulate "A resumed
    # after break" by swapping the lock content under a patched
    # _commit_lock whose assert_owned sees a foreign token.
    a = ManifestTable(root, [])
    orig_write_excl = a.mfs.write_text_exclusive

    def stall_then_lose_lock(data: str, *rel: str):
        orig_write_excl(data, *rel)
        if rel and rel[0].startswith("manifest-"):
            # between A's manifest allocation and its pointer swap, the
            # breaker steals the lock and commits
            a.mfs.delete("_commit.lock")
            a.mfs.write_text("0|breaker-token", "_commit.lock")
            b = ManifestTable(root, [])
            b.append(spark.range(2).select(F.col("id").alias("k")))

    a.mfs.write_text_exclusive = stall_then_lose_lock
    with pytest.raises(CommitConflict, match="lock was broken"):
        a.append(spark.range(5, 8).select(F.col("id").alias("k")))

    # B's commit is head; A's orphan manifest never became the pointer
    t2 = ManifestTable(root, [])
    assert t2.read(spark).count() == 5  # 3 overwrite + 2 from breaker
    assert t2.current_manifest_name() != head_before


# --------------------------------------------- 2. non-integral recon keys


def test_reconcile_string_keys_bucket_and_diff(spark):
    from pipelinewise_spark.operators.reconcile import (
        reconcile_diff,
        reconcile_report,
    )

    rows = [(f"uuid-{i:04d}", f"v{i}") for i in range(200)]
    src = spark.createDataFrame(rows, ["pk", "val"])
    # target: drop one, modify one, add one
    tgt = (
        src.filter(F.col("pk") != "uuid-0007")
        .withColumn(
            "val",
            F.when(F.col("pk") == "uuid-0042", F.lit("corrupted")).otherwise(
                F.col("val")
            ),
        )
        .unionByName(spark.createDataFrame([("uuid-9999", "x")], ["pk", "val"]))
    )
    canon = [F.col("pk"), F.col("val")]
    rep = reconcile_report(src, tgt, "pk", canon, n_buckets=8).collect()
    assert len(rep) == 8
    assert {r["bucket"] for r in rep} <= set(range(8))  # no null buckets
    assert sum(r["src_cnt"] for r in rep) == 200
    assert sum(r["tgt_cnt"] for r in rep) == 200  # -1 dropped +1 added
    assert any(not r["consistent"] for r in rep)

    diff = {
        r["key"]: r["status"]
        for r in reconcile_diff(src, tgt, "pk", canon).collect()
    }
    assert diff == {
        "uuid-0007": "missing_in_target",
        "uuid-0042": "modified",
        "uuid-9999": "missing_in_source",
    }


def test_reconcile_integral_keys_still_direct_pmod(spark):
    """Integral keys keep key%n bucketing — the property the DuckDB
    oracle reproduces with `o_orderkey % 64`."""
    from pipelinewise_spark.operators.reconcile import reconcile_report

    src = spark.range(100).select(F.col("id").alias("pk"))
    rep = reconcile_report(
        src, src, "pk", [F.col("pk").cast("string")], n_buckets=10
    ).collect()
    # key%10 puts exactly 10 keys in every bucket
    assert all(r["src_cnt"] == 10 and r["consistent"] for r in rep)


# ------------------------------------------------ 3. kmeans budget guard


def test_kmeans_overflow_guard_raises(spark):
    """Vectors scaled so max|q| makes the exact-compare budget tiny: the
    guard must raise ValueError naming the budget, not misassign."""
    from pipelinewise_spark.functions.kmeans import kmeans_exact

    # |x| ~ 3e7 -> |q| ~ 3e13; budget ~ (1e38/(4*4*q^2))^(1/4) ~ 120-ish
    # but the 2^53 float bound is ~ 150; with 300 rows per cluster the
    # guard trips on the first iteration.
    rows = [(i, [3.0e7 + (i % 3), 0.0, 0.0, 0.0]) for i in range(600)]
    df = spark.createDataFrame(rows, ["id", "vec"])
    with pytest.raises(ValueError, match="exceeds the exact-arithmetic"):
        kmeans_exact(df, "id", "vec", k=2, iterations=1)


# ------------------------------------------------- 4. non-CAS fs warning


def test_write_text_exclusive_warns_on_non_cas_fs(tmp_path, monkeypatch):
    import pyarrow.fs as pafs

    from pipelinewise_spark.operators import fsio

    mfs = fsio.MetaFS(str(tmp_path))
    # impersonate a non-local, non-S3 store: route through a SubTree
    # wrapper (not a LocalFileSystem instance, no conditional PUT)
    mfs.fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    mfs.root = "."
    monkeypatch.setattr(fsio, "_WARNED_NONCAS", False)
    with pytest.warns(RuntimeWarning, match="no\\s+store-side conditional"):
        mfs.write_text_exclusive("x", "probe.txt")
    with pytest.raises(FileExistsError):
        mfs.write_text_exclusive("x", "probe.txt")


def test_write_text_exclusive_local_does_not_warn(tmp_path, monkeypatch):
    import warnings

    from pipelinewise_spark.operators import fsio

    monkeypatch.setattr(fsio, "_WARNED_NONCAS", False)
    mfs = fsio.MetaFS(str(tmp_path))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mfs.write_text_exclusive("x", "probe.txt")


# ------------------------------------- 5. map<k, Message> empty default


_PROTO = """
syntax = "proto3";
message Inner { int32 n = 1; }
message Outer { map<string, Inner> m = 1; }
"""


def test_map_message_value_omitted_decodes_to_empty_message():
    schema = parse_proto(_PROTO)
    # hand-build an entry with key only (value omitted): field 1 of Outer,
    # wire 2; entry bytes = field1(string key "a")
    entry = bytes([0x0A, 0x01]) + b"a"  # key="a", no value field
    buf = bytes([0x0A, len(entry)]) + entry
    out = decode_message(buf, schema, "Outer")
    assert out == {"m": {"a": {}}}  # {} not None — MessageToDict contract

    # a present-but-empty Inner value decodes the same way
    entry2 = bytes([0x0A, 0x01]) + b"b" + bytes([0x12, 0x00])
    buf2 = bytes([0x0A, len(entry2)]) + entry2
    assert decode_message(buf2, schema, "Outer") == {"m": {"b": {}}}


# -------------------------------- kmeans Arrow kernel == Catalyst fold


def test_kmeans_kernel_equals_catalyst_fold(spark):
    """Fuzz corpus with duplicate vectors (exact ties), near-tie pairs and
    random spread: the numpy kernel and the interpreted DECIMAL fold must
    produce IDENTICAL assignments (same strictly-less, ties-to-lower-j
    contract)."""
    from pipelinewise_spark.functions.kmeans import (
        _argmin_cluster,
        _argmin_udf,
        _quantize,
    )

    rng = random.Random(9)
    dim = 8
    rows = []
    for i in range(120):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, base))
        if i % 5 == 0:
            rows.append((1000 + i, list(base)))  # exact duplicate
        if i % 7 == 0:  # near-tie: one micro-unit off
            rows.append(
                (2000 + i, [base[0] + 1e-6] + base[1:])
            )
    df = spark.createDataFrame(rows, ["id", "vec"])
    v = df.select("id", _quantize("vec").alias("__q"))
    # centroid states with unequal counts (cross-multiply is non-trivial)
    cents = []
    for j in range(1, 5):
        c = j * 3
        s = [rng.randint(-c * 10**6, c * 10**6) for _ in range(dim)]
        cents.append((j, s, c))
    # engineer an exact centroid tie: centroid 5 = scaled copy of 1
    j1, s1, c1 = cents[0]
    cents.append((5, [x * 2 for x in s1], c1 * 2))

    got = v.select(
        "id",
        _argmin_udf(cents)(F.col("__q")).cast("long").alias("kernel"),
        _argmin_cluster(cents).cast("long").alias("fold"),
    ).collect()
    mismatches = [(r["id"], r["kernel"], r["fold"]) for r in got
                  if r["kernel"] != r["fold"]]
    assert not mismatches, mismatches[:5]
    # the tie engineering worked: centroid 5 never wins (lower j=1 does)
    assert all(r["fold"] != 5 for r in got)


# ----------------------------------- r9 task 6: segment-level KS drift


def test_ks_drift_by_segment_empty_side_is_max_drift(spark):
    """A segment present in only one epoch (appeared/vanished) is maximal
    drift by definition — d_ppm=1e6, significant — not a crash or NULL."""
    from pipelinewise_spark.operators.drift import ks_drift_by_segment

    ref = spark.createDataFrame(
        [("a", float(i)) for i in range(20)], "seg string, v double"
    )
    cur = spark.createDataFrame(
        [("a", float(i)) for i in range(20)]
        + [("b", float(i)) for i in range(5)],
        "seg string, v double",
    )
    got = {
        r["segment"]: r
        for r in ks_drift_by_segment(ref, cur, "v", "seg").collect()
    }
    assert got["b"]["d_ppm"] == 1_000_000 and got["b"]["significant"]
    assert got["b"]["n_ref"] == 0 and got["b"]["n_cur"] == 5
    # identical distributions: D = 0, quiet
    assert got["a"]["d_ppm"] == 0 and not got["a"]["significant"]


def test_ks_drift_by_segment_matches_scipy_shape(spark):
    """Cross-check the per-segment sup-distance against a pure-Python
    two-sample KS on the same values."""
    import random

    from pipelinewise_spark.operators.drift import ks_drift_by_segment

    rng = random.Random(11)
    ref_rows = [("s1", rng.gauss(0, 1)) for _ in range(80)] + [
        ("s2", rng.gauss(0, 1)) for _ in range(60)
    ]
    cur_rows = [("s1", rng.gauss(0.8, 1)) for _ in range(70)] + [
        ("s2", rng.gauss(0, 1)) for _ in range(90)
    ]
    ref = spark.createDataFrame(ref_rows, "seg string, v double")
    cur = spark.createDataFrame(cur_rows, "seg string, v double")
    got = {
        r["segment"]: r
        for r in ks_drift_by_segment(ref, cur, "v", "seg").collect()
    }

    def ks_ppm(a, b):
        vals = sorted(set(a) | set(b))
        na, nb, best = len(a), len(b), 0
        ca = cb = 0
        from collections import Counter

        fa, fb = Counter(a), Counter(b)
        for v in vals:
            ca += fa[v]
            cb += fb[v]
            best = max(best, abs(ca * nb - cb * na))
        return (1_000_000 * best) // (na * nb)

    for seg in ("s1", "s2"):
        a = [v for s, v in ref_rows if s == seg]
        b = [v for s, v in cur_rows if s == seg]
        assert got[seg]["d_ppm"] == ks_ppm(a, b)
    assert got["s1"]["significant"] and not got["s2"]["significant"]
