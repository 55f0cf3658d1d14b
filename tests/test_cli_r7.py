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
