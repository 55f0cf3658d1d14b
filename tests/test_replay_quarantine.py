"""The replay-quarantine CLI verb: dead-letter rows re-drive through
validation under a FIXED schema, repaired rows MERGE into the target,
the remainder stays quarantined — the loop quarantine_split opens,
closed from the command line."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pipelinewise_spark.__main__ import main as cli_main
from pipelinewise_spark.operators.manifest_table import ManifestTable
from pipelinewise_spark.operators.table import ParquetTable
from pipelinewise_spark.operators.validation import (
    compile_json_schema,
    quarantine_split,
)


def _schema(vmax):
    return {
        "type": "object",
        "required": ["k"],
        "properties": {
            "k": {"type": ["integer"]},
            "value": {"type": ["number", "null"],
                      "minimum": 0, "maximum": vmax},
        },
    }


def _seed(spark, tmp_path, versioned):
    # rows 0..50 valid under vmax=50; 51..79 (29 rows) repairable under vmax=100;
    # one row (value=150) is invalid even after the fix
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(80)] + [(99, 150.0)],
        "k long, value double",
    )
    valid, dlq = quarantine_split(df, compile_json_schema(_schema(50)))
    target = str(tmp_path / "tgt")
    ManifestTable(target).overwrite(valid)
    q = str(tmp_path / "dlq")
    if versioned:
        ParquetTable(q).overwrite(dlq)
    else:
        dlq.write.mode("overwrite").parquet(q)
    fixed = str(tmp_path / "fixed_schema.json")
    with open(fixed, "w") as fh:
        json.dump(_schema(100), fh)
    return target, q, fixed


def test_replay_into_versioned_quarantine(capsys, spark, tmp_path):
    target, q, fixed = _seed(spark, tmp_path, versioned=True)
    rc = cli_main([
        "replay-quarantine", q, "--schema", fixed,
        "--table", target, "--pk", "k",
    ])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1  # value=150 remains quarantined
    assert out["replayed"] == 29 and out["still_invalid"] == 1
    t = ManifestTable(target).read(spark)
    assert t.count() == 81 - 1  # 0..79 landed; 150-row still out
    assert t.filter(F.col("value") > 50).count() == 29
    # the quarantine itself was atomically rewritten to the remainder
    rem = ParquetTable(q).read(spark)
    assert rem.count() == 1
    # fully relaxed schema drains it -> exit 0
    drained = str(tmp_path / "relaxed.json")
    with open(drained, "w") as fh:
        json.dump(_schema(1000), fh)
    rc2 = cli_main([
        "replay-quarantine", q, "--schema", drained,
        "--table", target, "--pk", "k",
    ])
    out2 = json.loads(capsys.readouterr().out)
    assert rc2 == 0 and out2["still_invalid"] == 0
    assert ManifestTable(target).read(spark).count() == 81


def test_replay_plain_parquet_quarantine(capsys, spark, tmp_path):
    target, q, fixed = _seed(spark, tmp_path, versioned=False)
    rc = cli_main([
        "replay-quarantine", q, "--schema", fixed,
        "--table", target, "--pk", "k",
    ])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and out["replayed"] == 29
    assert out["remaining"].endswith("_remaining")
    rem = spark.read.parquet(out["remaining"])
    assert rem.count() == 1 and "_dlq_record" in rem.columns


def test_replay_rejects_non_quarantine_input(spark, tmp_path):
    import pytest

    df = spark.range(5)
    p = str(tmp_path / "notdlq")
    df.write.parquet(p)
    sch = str(tmp_path / "s.json")
    with open(sch, "w") as fh:
        json.dump(_schema(10), fh)
    with pytest.raises(SystemExit, match="_dlq_record"):
        cli_main([
            "replay-quarantine", p, "--schema", sch,
            "--table", str(tmp_path / "t"), "--pk", "k",
        ])
