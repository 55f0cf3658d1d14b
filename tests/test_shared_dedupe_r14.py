"""r14 shared-dedupe optimization (streaming/cdc.py): with a rollup
attached, run_cdc_stream dedupes the micro-batch ONCE and pins it for
both consumers (rollup fold + merge). Results must be identical to the
unshared path (PWS_CDC_SHARED_DEDUPE=0), including under in-batch PK
duplicates — the case the last-wins window exists for."""

from __future__ import annotations

import os

import pyspark.sql.types as T
from pyspark.sql import functions as F

from pipelinewise_spark.operators.sdc import add_sdc_columns
from pipelinewise_spark.operators.table import ParquetTable
from pipelinewise_spark.plans.spec import StreamSpec
from pipelinewise_spark.streaming.cdc import run_cdc_stream
from pipelinewise_spark.streaming.mv import StreamingRollup

_ENV = (
    "_op string, _seq long, _event_ts string, "
    "id long, grp string, val double"
)


def _run(spark, tmp, shared: str):
    """One full CDC+rollup stream under the given sharing mode; returns
    (sorted live target rows, sorted rollup rows)."""
    root = os.path.join(tmp, f"mode_{shared}")
    events_dir = os.path.join(root, "events")
    os.makedirs(events_dir)
    spec = StreamSpec(
        tap_stream_id="t", primary_keys=["id"], hard_delete=False
    )
    table = ParquetTable(os.path.join(root, "t"))
    base = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(10 * i)) for i in range(1, 7)],
        "id long, grp string, val double",
    )
    table.overwrite(
        add_sdc_columns(
            base, extracted_at="2026-01-01", batched_at="2026-01-01"
        ).withColumn("_sdc_seq", F.lit(0).cast("long"))
    )
    rollup = StreamingRollup(
        ParquetTable(os.path.join(root, "mv")), ["grp"], {"total": "val"}
    )
    rollup.initialize(table.read(spark))

    # in-batch PK duplicates: id=1 updated twice (seq 10 then 14 — the
    # 14 must win), id=2 deleted-then-reasserted is split across seqs
    changes = [
        ("u", 10, 1, "a", 11.0), ("u", 14, 1, "a", 99.0),
        ("d", 11, 2, "b", None), ("c", 12, 7, "a", 5.0),
        ("u", 13, 4, "b", 41.0),
    ]
    rows = spark.createDataFrame(
        [(op, seq, "2026-01-02", i, g, v) for op, seq, i, g, v in changes],
        _ENV,
    )
    rows.repartition(4).write.mode("overwrite").json(events_dir)

    payload = T._parse_datatype_string("id long, grp string, val double")
    os.environ["PWS_CDC_SHARED_DEDUPE"] = shared
    try:
        run_cdc_stream(
            spark, events_dir, payload, spec, table,
            checkpoint_dir=os.path.join(root, "_checkpoint"),
            max_files_per_trigger=2,  # 2 micro-batches over 4 files
            rollup=rollup,
        )
    finally:
        os.environ.pop("PWS_CDC_SHARED_DEDUPE", None)

    live = sorted(
        (r["id"], r["grp"], r["val"])
        for r in table.read(spark)
        .filter(F.col("_sdc_deleted_at").isNull())
        .collect()
    )
    mv = sorted(
        (r["grp"], r["n_rows"], float(r["total"]))
        for r in rollup.read(spark).collect()
    )
    return live, mv


def test_shared_dedupe_matches_unshared(spark, tmp_path):
    live_on, mv_on = _run(spark, str(tmp_path), "1")
    live_off, mv_off = _run(spark, str(tmp_path), "0")
    assert live_on == live_off
    assert mv_on == mv_off
    # sanity on the shape itself: last-wins kept seq 14's value for id=1
    assert (1, "a", 99.0) in live_on
    assert all(i != 2 for i, _, _ in live_on)  # the delete landed
