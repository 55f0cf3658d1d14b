"""Pins for the ingest-time domain-cap admitter (functions/curation.py:
StreamingDomainCapAdmitter): budgets never overshoot, per-epoch
artifacts make redelivery duplicate-proof, restart resumes from state,
and a REAL checkpointed file stream honors the cap."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pipelinewise_spark.functions.curation import StreamingDomainCapAdmitter


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % 4).cast("string")).alias("dom"),
    )


def test_cap_never_overshoots_and_first_come(spark, tmp_path):
    d = _docs(spark)
    adm = StreamingDomainCapAdmitter(
        "dom", "doc_id", cap=7,
        state_dir=str(tmp_path / "st"), out_dir=str(tmp_path / "out"),
    )
    for k in range(4):
        adm.on_batch(
            d.filter((F.col("doc_id") >= k * 50)
                     & (F.col("doc_id") < (k + 1) * 50)),
            k,
        )
    out = adm.admitted(spark)
    by_dom = {
        r["dom"]: r["n"]
        for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom == {f"d{i}": 7 for i in range(4)}
    # first-come: the admitted ids are exactly the lowest 7 per domain
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == sorted(i for i in range(200) if i // 4 < 7 or i < 28)[:28]


def test_redelivery_is_duplicate_proof(spark, tmp_path):
    d = _docs(spark, 40)
    adm = StreamingDomainCapAdmitter(
        "dom", "doc_id", cap=5,
        state_dir=str(tmp_path / "st"), out_dir=str(tmp_path / "out"),
    )
    adm.on_batch(d, 0)
    n = adm.admitted(spark).count()
    adm.on_batch(d, 0)  # replay: hwm guard, artifact untouched
    assert adm.admitted(spark).count() == n == 20
    st = json.loads((tmp_path / "st" / "_domain_cap_state.json").read_text())
    assert st["n_applied"] == 1


def test_restart_resumes_budgets(spark, tmp_path):
    d = _docs(spark, 80)
    sd, od = str(tmp_path / "st"), str(tmp_path / "out")
    adm = StreamingDomainCapAdmitter("dom", "doc_id", 6, sd, od)
    adm.on_batch(d.filter(F.col("doc_id") < 16), 0)  # 4 per domain
    # crash + restart: a fresh admitter resumes the spent budgets
    adm2 = StreamingDomainCapAdmitter("dom", "doc_id", 6, sd, od)
    adm2.on_batch(d.filter(F.col("doc_id") >= 16), 1)
    by_dom = {
        r["dom"]: r["n"]
        for r in adm2.admitted(spark)
        .groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom == {f"d{i}": 6 for i in range(4)}


def test_real_stream_honors_cap(spark, tmp_path):
    import pyspark.sql.types as T

    d = _docs(spark, 400)
    src = str(tmp_path / "in")
    os.makedirs(src)
    d.repartition(8).write.mode("append").json(src)
    adm = StreamingDomainCapAdmitter(
        "dom", "doc_id", cap=9,
        state_dir=str(tmp_path / "st"), out_dir=str(tmp_path / "out"),
    )
    q = (
        spark.readStream.schema(
            T._parse_datatype_string("doc_id long, dom string")
        )
        .option("maxFilesPerTrigger", 3)
        .json(src)
        .writeStream.foreachBatch(adm.on_batch)
        .option("checkpointLocation", str(tmp_path / "_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert adm.state["n_applied"] >= 2
    by_dom = {
        r["dom"]: r["n"]
        for r in adm.admitted(spark)
        .groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    # arrival order is stream-dependent; the CAP is not
    assert by_dom == {f"d{i}": 9 for i in range(4)}


def test_crash_between_artifact_and_state_is_replay_safe(
    spark, tmp_path, monkeypatch
):
    """Writer dies AFTER the epoch artifact lands but BEFORE the state
    save: the replay recomputes the same admitted set from the
    unchanged budgets and overwrites the same directory — no
    duplicates, no lost rows."""
    import pytest

    d = _docs(spark, 40)
    sd, od = str(tmp_path / "st"), str(tmp_path / "out")
    adm = StreamingDomainCapAdmitter("dom", "doc_id", 5, sd, od)

    def dying_save():
        raise RuntimeError("died before state save")

    monkeypatch.setattr(adm, "_save", dying_save)
    with pytest.raises(RuntimeError):
        adm.on_batch(d, 0)
    monkeypatch.undo()
    # the artifact exists, the state does not know it — a fresh
    # admitter (restart) replays epoch 0 idempotently
    adm2 = StreamingDomainCapAdmitter("dom", "doc_id", 5, sd, od)
    assert adm2.state["n_applied"] == 0
    adm2.on_batch(d, 0)
    out = adm2.admitted(spark)
    assert out.count() == 20
    assert out.select("doc_id").distinct().count() == 20  # no dupes
