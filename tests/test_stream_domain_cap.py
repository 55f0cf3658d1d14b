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


def test_budget_state_is_parquet_backed_at_1m_domains(spark, tmp_path):
    """r12: the per-domain budget table is parquet, not driver JSON —
    at 1M domains the sidecar stays metadata-sized and the fold is a
    distributed join (flat driver memory at any domain count)."""
    n_dom = 1_000_000
    b0 = spark.range(n_dom).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("dom"),
    )
    # second wave: 100k duplicates of the first domains — all rejected
    b1 = spark.range(100_000).select(
        (F.col("id") + n_dom).alias("doc_id"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("dom"),
    )
    adm = StreamingDomainCapAdmitter(
        "dom", "doc_id", cap=1,
        state_dir=str(tmp_path / "st"), out_dir=str(tmp_path / "out"),
    )
    adm.on_batch(b0, 0)
    adm.on_batch(b1, 1)
    assert adm.admitted(spark).count() == n_dom
    assert adm.budgets(spark).count() == n_dom
    # the JSON sidecar carries METADATA only — no per-domain entries
    st_path = tmp_path / "st" / "_domain_cap_state.json"
    st = json.loads(st_path.read_text())
    assert "admitted" not in st
    assert st["budget_version"] == 2
    assert st_path.stat().st_size < 1024
    # GC keeps at most the committed version and its predecessor
    vs = sorted(os.listdir(tmp_path / "st" / "budgets"))
    assert vs == ["v=1", "v=2"]


def test_legacy_json_budget_state_migrates(spark, tmp_path):
    """A pre-r12 sidecar ({domain: count} JSON) resumes correctly and
    migrates to the parquet budget table on the next fold."""
    sd = tmp_path / "st"
    os.makedirs(sd)
    legacy = {
        "cap": 3,
        "admitted": {"d0": 2, "d1": 3},
        "epoch_hwm": 0,
        "n_applied": 1,
    }
    (sd / "_domain_cap_state.json").write_text(json.dumps(legacy))
    adm = StreamingDomainCapAdmitter(
        "dom", "doc_id", cap=3,
        state_dir=str(sd), out_dir=str(tmp_path / "out"),
    )
    d = _docs(spark, 40)  # 10 per domain d0..d3
    adm.on_batch(d, 1)
    by_dom = {
        r["dom"]: r["n"]
        for r in spark.read.parquet(str(tmp_path / "out" / "epoch=1"))
        .groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    # d0 had 1 budget left, d1 none, d2/d3 full cap
    assert by_dom == {"d0": 1, "d2": 3, "d3": 3}
    st = json.loads((sd / "_domain_cap_state.json").read_text())
    assert "admitted" not in st and st["budget_version"] == 1
    used = {
        r["__dom"]: r["__used"] for r in adm.budgets(spark).collect()
    }
    assert used == {"d0": 3, "d1": 3, "d2": 3, "d3": 3}


def test_tiebreak_cols_make_admission_deterministic(spark, tmp_path):
    """With ties in order_col, tiebreak_cols pin the admitted subset:
    two runs over the same batch admit the SAME rows."""
    rows = [(i, "d0", i % 2, f"u{i}") for i in range(10)]
    d = spark.createDataFrame(
        rows, "doc_id long, dom string, pri int, uid string"
    )
    got = []
    for run in range(2):
        adm = StreamingDomainCapAdmitter(
            "dom", "pri", cap=4,
            state_dir=str(tmp_path / f"st{run}"),
            out_dir=str(tmp_path / f"out{run}"),
            tiebreak_cols=["uid"],
        )
        adm.on_batch(d.repartition(8 if run else 3), 0)
        got.append(sorted(r["doc_id"] for r in adm.admitted(spark).collect()))
    assert got[0] == got[1]
    # pri asc then uid asc: pri=0 ids {0,2,4,6,8} -> uids u0,u2,u4,u6,u8
    # sorted lexicographically: u0,u2,u4,u6 -> ids 0,2,4,6
    assert got[0] == [0, 2, 4, 6]


def test_budget_gc_sweeps_crash_orphans(spark, tmp_path):
    """A crash between _save() and the GC delete leaves one stale
    budget version behind; the NEXT fold's downward sweep must retire
    it, keeping storage at <= 2 versions."""
    d = _docs(spark, 400)
    adm = StreamingDomainCapAdmitter(
        "dom", "doc_id", cap=99,
        state_dir=str(tmp_path / "st"), out_dir=str(tmp_path / "out"),
    )
    for k in range(3):
        adm.on_batch(
            d.filter((F.col("doc_id") >= k * 100)
                     & (F.col("doc_id") < (k + 1) * 100)), k)
    bdir = tmp_path / "st" / "budgets"
    assert sorted(os.listdir(bdir)) == ["v=2", "v=3"]
    # simulate the orphan a crashed GC leaves: re-create v=1
    os.makedirs(bdir / "v=1")
    (bdir / "v=1" / "part-orphan.parquet").write_bytes(b"")
    adm.on_batch(
        d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)), 3)
    assert sorted(os.listdir(bdir)) == ["v=3", "v=4"]
