"""Branch/WAP + expectations operator tests (manifest_table branches,
operators/expectations.py)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from pipelinewise_spark.operators.expectations import (
    ExpectationError,
    enforce,
    expectations_report,
    in_range,
    not_null,
    row_count_at_least,
    unique,
    write_audit_publish,
)
from pipelinewise_spark.operators.manifest_table import ManifestTable


def _df(spark, n=10, null_every=0):
    c = F.col("id")
    df = spark.range(n).select(
        c.alias("k"),
        (c % 3).cast("string").alias("p"),
        (c * 2).alias("v"),
    )
    if null_every:
        df = df.withColumn(
            "v", F.when(F.col("k") % null_every != 0, F.col("v"))
        )
    return df


@pytest.fixture()
def table(spark, tmp_path):
    t = ManifestTable(os.path.join(str(tmp_path), "t"), ["p"])
    t.overwrite(_df(spark))
    return t


def test_branch_isolation_and_fast_forward(spark, table):
    main_before = table.current_manifest_name()
    br = table.create_branch("stage")
    br.merge(spark, _df(spark, 20).filter(F.col("k") >= 10), ["k"])
    # staged rows visible through the branch, invisible on main
    assert br.read(spark).count() == 20
    assert table.read(spark).count() == 10
    assert table.current_manifest_name() == main_before
    table.fast_forward("stage")
    assert table.read(spark).count() == 20
    table.drop_branch("stage")
    assert table.branches() == []


def test_fast_forward_refuses_when_main_moved(spark, table):
    table.create_branch("stage").merge(
        spark, _df(spark, 12).filter(F.col("k") >= 10), ["k"]
    )
    # concurrent commit on main after the branch was cut
    table.merge(
        spark,
        _df(spark, 10).withColumn("v", F.col("v") + 1), ["k"],
    )
    with pytest.raises(RuntimeError, match="main moved"):
        table.fast_forward("stage")
    table.drop_branch("stage")


def test_vacuum_spares_branch_heads_until_dropped(spark, table):
    br = table.create_branch("stage")
    br.overwrite(_df(spark, 5))
    staged = {e["path"] for e in br._load_manifest()["files"]}
    # churn main so old manifests rotate out of the retention window
    for i in range(3):
        table.merge(
            spark, _df(spark, 10).withColumn("v", F.col("v") + i), ["k"]
        )
    table.vacuum(keep_manifests=1)
    for p in staged:
        assert table.mfs.exists(p), "branch-referenced file vacuumed"
    table.drop_branch("stage")
    table.vacuum(keep_manifests=1)
    assert not any(table.mfs.exists(p) for p in staged)


def test_expectations_metrics_and_enforce(spark):
    df = _df(spark, 10, null_every=5)  # v NULL at k=0,5 -> ratio 0.8
    report = {
        (r["rule"], r["column"]): r
        for r in expectations_report(
            df,
            [
                not_null("v", 0.8),
                not_null("v", 0.9),
                unique("k"),
                in_range("k", 0, 4, min_ratio=0.5),
                row_count_at_least(11),
            ],
        ).collect()
    }
    assert report[("not_null", "v")]["metric"] == pytest.approx(0.8)
    passed = {k: r["passed"] for k, r in report.items()}
    del passed[("not_null", "v")]  # two thresholds share the key
    assert passed == {
        ("unique", "k"): True,
        ("in_range", "k"): True,
        ("row_count_at_least", "*"): False,
    }
    with pytest.raises(ExpectationError, match="row_count_at_least"):
        enforce(df, [row_count_at_least(11)])
    # empty input fails closed (NULL ratio -> passed false)
    empty = expectations_report(df.limit(0), [not_null("v")]).collect()
    assert not empty[0]["passed"]


def test_wap_rejected_batch_leaves_main_bitwise_unchanged(spark, table):
    before = table.current_manifest_name()
    ok, report = write_audit_publish(
        spark, table, [not_null("v")],
        lambda br: br.merge(
            spark,
            _df(spark, 30)
            .filter(F.col("k") >= 20)
            .withColumn("v", F.lit(None).cast("long")),
            ["k"],
        ),
    )
    assert not ok
    assert table.current_manifest_name() == before
    assert table.branches() == []  # ref dropped on failure
    ok2, _ = write_audit_publish(
        spark, table, [not_null("v"), unique("k")],
        lambda br: br.merge(
            spark, _df(spark, 30).filter(F.col("k") >= 20), ["k"]
        ),
    )
    assert ok2 and table.read(spark).count() == 20


def test_volume_anomaly_rule(spark):
    from pipelinewise_spark.operators.anomaly import volume_anomalies

    hist = spark.createDataFrame(
        [(i, 100 + (i % 3)) for i in range(10)] + [(10, 600), (11, 2)],
        "version int, rows_added long",
    )
    got = {
        r["version"]: r["is_anomaly"]
        for r in volume_anomalies(hist, "rows_added").collect()
    }
    assert got[10] and got[11]          # both directions flag
    assert not any(got[i] for i in range(10))  # regular commits pass


def test_references_rule_single_scan_with_nulls(spark):
    from pipelinewise_spark.operators.expectations import references

    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    facts = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 9), (4, None)], "id long, fk long"
    )
    rep = expectations_report(
        facts,
        [references("fk", dim, "k", min_ratio=0.9), not_null("fk", 0.5)],
    ).collect()
    by = {r["rule"]: r for r in rep}
    # 3 non-null FKs, 2 resolve -> 2/3; NULL fk excluded from the ratio
    assert by["references"]["metric"] == pytest.approx(2 / 3)
    assert not by["references"]["passed"]
    assert by["not_null"]["metric"] == pytest.approx(0.75)


def test_concurrent_commit_detected_not_lost(spark, table, monkeypatch):
    """A writer that raced another commit must raise CommitConflict, not
    silently drop the other writer's rows (optimistic concurrency)."""
    from pipelinewise_spark.operators.manifest_table import (
        CommitConflict,
        ManifestTable,
    )

    # interleave: when writer A is about to publish its merge, writer B
    # (a second handle) has already advanced the pointer
    orig_publish = ManifestTable._publish

    state = {"raced": False}

    def racing_publish(self, manifest, op="commit", expected_parent=None):
        if op == "merge" and not state["raced"]:
            state["raced"] = True
            b = ManifestTable(self.root)
            orig_merge(
                b, spark,
                _df(spark, 12).filter(F.col("k") >= 10), ["k"],
            )
        return orig_publish(
            self, manifest, op=op, expected_parent=expected_parent
        )

    orig_merge = ManifestTable.merge
    monkeypatch.setattr(ManifestTable, "_publish", racing_publish)
    with pytest.raises(CommitConflict, match="snapshot moved"):
        table.merge(
            spark, _df(spark, 10).withColumn("v", F.col("v") + 1), ["k"]
        )
    monkeypatch.undo()
    # writer B's commit survived; writer A simply retries
    assert table.read(spark).count() == 12
    table.merge(
        spark, _df(spark, 10).withColumn("v", F.col("v") + 1), ["k"]
    )
    assert table.read(spark).count() == 12


# ------------------------------------------------------- privacy rules


def test_k_anonymous_rule_fraction(spark):
    from pipelinewise_spark.operators.expectations import (
        expectations_report,
        k_anonymous,
    )

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",)],
        "qi string",
    )
    row = expectations_report(df, [k_anonymous(["qi"], k=3)]).collect()[0]
    # 5 of 8 rows live in a class of size >= 3
    assert row["metric"] == 5 / 8
    assert not row["passed"]
    row = expectations_report(
        df, [k_anonymous(["qi"], k=3, min_ratio=0.5)]
    ).collect()[0]
    assert row["passed"]


def test_l_diverse_rule_fraction(spark):
    from pipelinewise_spark.operators.expectations import (
        expectations_report,
        l_diverse,
    )

    df = spark.createDataFrame(
        # class 'a': 3 rows, 2 distinct secrets (diverse);
        # class 'b': 2 rows, 1 secret (leaks its attribute)
        [("a", 1), ("a", 1), ("a", 2), ("b", 9), ("b", 9)],
        "qi string, secret int",
    )
    row = expectations_report(
        df, [l_diverse(["qi"], "secret", l_min=2)]
    ).collect()[0]
    assert row["metric"] == 3 / 5
    assert not row["passed"]


def test_privacy_rules_compose_with_classic_rules_one_pass(spark):
    from pipelinewise_spark.operators.expectations import (
        expectations_report,
        k_anonymous,
        l_diverse,
        not_null,
        unique,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 11), (3, "a", 12), (4, "b", 13)],
        "pk int, qi string, secret int",
    )
    rep = {
        r["rule"]: r
        for r in expectations_report(
            df,
            [
                not_null("pk"),
                unique("pk"),
                k_anonymous(["qi"], k=3, min_ratio=0.7),
                l_diverse(["qi"], "secret", l_min=2, min_ratio=0.7),
            ],
        ).collect()
    }
    assert rep["not_null"]["passed"] and rep["unique"]["passed"]
    assert rep["k_anonymous"]["metric"] == 0.75
    assert rep["k_anonymous"]["passed"]
    assert rep["l_diverse"]["metric"] == 0.75
    assert rep["l_diverse"]["passed"]


def test_wap_refuses_on_privacy_risk(spark, tmp_path):
    from pipelinewise_spark.operators.expectations import (
        k_anonymous,
        write_audit_publish,
    )
    from pipelinewise_spark.operators.manifest_table import ManifestTable

    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "pk int, name string"
    )
    t = ManifestTable(str(tmp_path / "rel"))
    t.overwrite(df.limit(0))
    ok, report = write_audit_publish(
        spark, t, [k_anonymous(["name"], k=2)],
        lambda br: br.merge(spark, df, ["pk"]),
    )
    assert not ok
    assert report[0]["metric"] == 0.0
    assert t.read(spark).count() == 0  # main never saw the staged rows
