"""Round-7 CLI verbs: delete (row-level DELETE WHERE via deletion
vectors — zero data-file rewrites from the command line)."""

from __future__ import annotations

import json

from pipelinewise_spark.__main__ import main as cli_main
from pipelinewise_spark.operators.manifest_table import ManifestTable


def test_cli_delete_verb(capsys, spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(90)],
        "id long, pt int, value double",
    )
    root = str(tmp_path / "t")
    t = ManifestTable(root, ["pt"])
    t.overwrite(df)
    files_before = sorted(e["path"] for e in t._load_manifest()["files"])

    rc = cli_main(["delete", root, "--where", "value >= 60"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["deleted_rows"] == 30

    t2 = ManifestTable(root)
    assert sorted(
        e["path"] for e in t2._load_manifest()["files"]
    ) == files_before
    assert t2.read(spark).count() == 60


def test_cli_branch_and_audit_wap_loop(capsys, spark, tmp_path):
    """CLI write-audit-publish: create a branch, stage a write through
    the API, audit it from the CLI, publish, and confirm main advanced."""
    import pyspark.sql.functions as F

    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    root = str(tmp_path / "t")
    t = ManifestTable(root, ["p"])
    t.overwrite(df)
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([
        {"rule": "not_null", "column": "v"},
        {"rule": "unique", "columns": ["k"]},
        {"rule": "row_count_at_least", "n": 15},
    ]))

    assert cli_main(["branch", "create", root, "stage"]) == 0
    capsys.readouterr()
    t.branch("stage").merge(
        spark, df.withColumn("k", F.col("k") + 10), ["k"]
    )
    # 20 rows staged -> row_count_at_least(15) passes on the branch...
    assert cli_main(["audit", root, str(rules), "--branch", "stage"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["passed"] and len(rep["report"]) == 3
    # ...but main still has 10: the same audit fails there (exit 1)
    assert cli_main(["audit", root, str(rules)]) == 1
    capsys.readouterr()
    assert cli_main(["branch", "publish", root, "stage"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["head"].startswith("manifest-")
    assert ManifestTable(root).read(spark).count() == 20
    assert cli_main(["branch", "list", root]) == 0
    assert json.loads(capsys.readouterr().out)["branches"] == {}


def test_cli_meta_verb(capsys, spark, tmp_path):
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    t = ManifestTable(root, ["p"])
    t.overwrite(
        spark.range(12).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"),
        )
    )
    t.merge(spark, spark.range(2).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
    ), ["k"])
    for kind, check in (
        ("snapshots", lambda rows: [r["version"] for r in rows] == [1, 2]),
        ("files", lambda rows: all("path" in r for r in rows)),
        ("partitions", lambda rows: sum(r["rows"] for r in rows) == 12),
    ):
        assert cli_main(["meta", root, kind]) == 0
        rows = [
            json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
        ]
        assert rows and check(rows), (kind, rows)


def test_cli_audit_references_rule(capsys, spark, tmp_path):
    import pyspark.sql.functions as F

    dim_path = str(tmp_path / "dim.parquet")
    spark.range(5).select(F.col("id").alias("pk")).write.parquet(dim_path)
    root = str(tmp_path / "t")
    t = ManifestTable(root, [])
    t.overwrite(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("fk")
        )
    )
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([
        {"rule": "references", "column": "fk", "dim": dim_path,
         "dim_column": "pk", "min_ratio": 0.9},
    ]))
    # fks 5,6 are orphans -> ratio 0.7ish < 0.9 -> exit 1, metric surfaced
    assert cli_main(["audit", root, str(rules)]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["passed"]
    assert rep["report"][0]["rule"] == "references"
    assert rep["report"][0]["metric"] < 0.9


def test_cli_sql_verb_serves_manifest_views(capsys, spark, tmp_path):
    import pyspark.sql.functions as F

    root = str(tmp_path / "orders_t")
    t = ManifestTable(root, ["p"])
    t.overwrite(
        spark.range(30).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("p"),
            (F.col("id") * 2).alias("v"),
        )
    )
    t.delete_where(spark, "k >= 20")  # DV rows must not be served
    rc = cli_main([
        "sql",
        "SELECT p, COUNT(*) AS n, SUM(v) AS sv FROM o GROUP BY p ORDER BY p",
        "--table", f"{root}:o",
    ])
    assert rc == 0
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert [r["n"] for r in rows] == [7, 7, 6]
    assert sum(r["sv"] for r in rows) == sum(2 * k for k in range(20))


def test_cli_update_rollback_changes_verbs(capsys, spark, tmp_path):
    """update -> changes -> rollback from the command line: the UPDATE
    rewrites only matched files, the CDF reports the commit's row
    events, and rollback restores v1 (verified by reading back)."""
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, pt int, value double",
    )
    root = str(tmp_path / "t")
    t = ManifestTable(root, ["pt"])
    t.overwrite(df)

    rc = cli_main([
        "update", root, "--where", "pt = 1 AND value >= 10",
        "--set", "value = value + 1000",
    ])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["updated_rows"] == 7  # ids 10,13,...,28

    rc = cli_main(["changes", root, "--from", "1"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    by = {(c["commit_version"], c["change_type"]): c["rows"]
          for c in out["changes"]}
    # CoW update: rewritten files' rows show as delete+insert (file
    # diff); only files CONTAINING matches rewrite, so both sides are
    # equal and at least the 7 matched rows (never the whole table)
    assert by[(2, "insert")] == by[(2, "delete")]
    assert 7 <= by[(2, "insert")] < 30

    rc = cli_main(["rollback", root, "--version", "1"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["restored_version"] == 1
    t2 = ManifestTable(root)
    assert t2.read(spark).agg({"value": "max"}).collect()[0][0] == 29.0

    # as-of rollback: stamp of v2 resolves to v2 (the updated state)
    s2 = t2._load_manifest(version=2)["committed_at"]
    rc = cli_main(["rollback", root, "--as-of", s2])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["restored_version"] == 2
    assert ManifestTable(root).read(spark).filter(
        "value > 1000"
    ).count() == 7


def test_cli_optimize_where_scoped_compaction(capsys, spark, tmp_path):
    import pyspark.sql.functions as F

    df = spark.range(12).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 1.0).alias("v"),
    )
    root = str(tmp_path / "t")
    t = ManifestTable(root, ["p"])
    t.overwrite(df)
    t.merge_on_read(spark, df.withColumn("v", F.col("v") + 1), ["k"])
    rc = cli_main(["optimize", root, "--where", "p=0"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["compacted_partitions"] == 1
    m = ManifestTable(root)._load_manifest()
    per = {}
    for e in m["files"]:
        per.setdefault(e["partition"]["p"], []).append(e)
    assert len(per["0"]) == 1 and len(per["1"]) >= 2
    assert ManifestTable(root).read(spark).count() == 12


def test_cli_optimize_rejects_where_with_zorder(capsys, spark, tmp_path):
    import pytest

    root = str(tmp_path / "t")
    t = ManifestTable(root, [])
    t.overwrite(spark.range(3).selectExpr("id AS k", "id * 1.0 AS v"))
    with pytest.raises(SystemExit, match="one or the other"):
        cli_main(["optimize", root, "--zorder", "k", "--where", "p=0"])


def test_cli_audit_privacy_rules(capsys, spark, tmp_path):
    """The audit verb speaks the privacy expectations: a singleton-quasi
    table fails k_anonymous (exit 1), a coarse-quasi one passes."""
    df = spark.createDataFrame(
        [(i, f"u{i}", "seg%d" % (i % 2), i % 3) for i in range(10)],
        "pk int, name string, seg string, secret int",
    )
    root = str(tmp_path / "t")
    t = ManifestTable(root)
    t.overwrite(df)

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([
        {"rule": "k_anonymous", "quasi_columns": ["name"], "k": 2},
    ]))
    assert cli_main(["audit", root, str(bad)]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert rep["report"][0]["metric"] == 0.0

    good = tmp_path / "good.json"
    good.write_text(json.dumps([
        {"rule": "k_anonymous", "quasi_columns": ["seg"], "k": 5},
        {"rule": "l_diverse", "quasi_columns": ["seg"],
         "sensitive_column": "secret", "l": 2},
    ]))
    assert cli_main(["audit", root, str(good)]) == 0


def test_cli_quality_verb(capsys, spark, tmp_path):
    """`quality` runs the full monitor matrix between two snapshots of
    a ManifestTable and writes the report sidecar beside the table:
    exit 0 on a quiet epoch pair, exit 1 (and drifted rows) after an
    injected segment-local shift; the JSON sidecar lands under
    _quality/ with the version pair in its name."""
    import pyspark.sql.functions as F

    base = spark.range(3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("seg"),
        (F.col("id") % 100 + 1).cast("double").alias("v"),
        F.to_date(F.lit("2024-03-01")).alias("d"),
    )
    root = str(tmp_path / "t")
    t = ManifestTable(root)
    t.overwrite(base)
    # epoch 2: same distribution — quiet (benford excluded: uniform
    # synthetic values legitimately deviate from Benford's law)
    t.merge(spark, base.withColumn("k", F.col("k") + 3000), ["k"])
    rc = cli_main([
        "quality", root, "--value-col", "v", "--key-col", "k",
        "--segment-col", "seg", "--date-col", "d",
        "--monitors", "volume,cardinality,tvd,ks,mw,freshness",
    ])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0 and not rep["drifted"]
    assert {r["monitor"] for r in rep["report"]} == {
        "volume", "cardinality", "tvd", "ks", "mw", "freshness"
    }
    sidecar = (
        tmp_path / "t" / "_quality"
        / f"report_v{rep['ref_version']}_v{rep['cur_version']}.json"
    )
    assert sidecar.exists()
    assert json.loads(sidecar.read_text()) == rep

    # epoch 3: shift one segment's values hard — the matrix must flag
    shifted = base.withColumn("k", F.col("k") + 6000).withColumn(
        "v",
        F.when(F.col("seg") == "1", F.col("v") + 500.0).otherwise(
            F.col("v")
        ),
    )
    t.merge(spark, shifted, ["k"])
    rc = cli_main([
        "quality", root, "--value-col", "v", "--key-col", "k",
        "--segment-col", "seg", "--date-col", "d",
        "--ref-version", str(rep["cur_version"]),
        "--monitors", "volume,cardinality,tvd,ks,mw,freshness",
    ])
    rep2 = json.loads(capsys.readouterr().out)
    assert rc == 1 and rep2["drifted"]
    drifted_monitors = {
        r["monitor"] for r in rep2["report"] if r["drifted"]
    }
    assert "ks" in drifted_monitors or "mw" in drifted_monitors
