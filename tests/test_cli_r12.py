"""Round-12 CLI verbs: export-capture / import-capture — the Singer
interop loop from the command line (export a table as a tap-stdout
capture, load it back, byte-level contract held end to end)."""

from __future__ import annotations

import json

from pipelinewise_spark.__main__ import main as cli_main
from pipelinewise_spark.operators.table import ParquetTable


def test_cli_capture_loop(capsys, spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.5) for i in range(60)],
        "id long, name string, amount double",
    )
    src = str(tmp_path / "src")
    ParquetTable(src).overwrite(df)
    cap = str(tmp_path / "cap.ndjson")

    rc = cli_main([
        "export-capture", src, "--out", cap,
        "--stream", "t1", "--pk", "id", "--version", "3",
    ])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["records"] == 60

    tgt = str(tmp_path / "tgt")
    rc = cli_main(["import-capture", cap, tgt])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["streams"] == {"t1": 60}
    back = ParquetTable(f"{tgt}/t1").read(spark)
    got = sorted(
        map(tuple, back.select("id", "name", "amount").collect())
    )
    assert got == sorted(map(tuple, df.collect()))

    # replay path with a state file
    tgt2 = str(tmp_path / "tgt2")
    st = str(tmp_path / "state.json")
    rc = cli_main([
        "import-capture", cap, tgt2, "--replay",
        "--batch-size", "25", "--state", st,
    ])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["streams"] == {"t1": 60}
    assert out["n_flushes"] >= 2  # 60 rows / 25-row flushes
