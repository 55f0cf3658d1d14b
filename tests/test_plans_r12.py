"""Plan pins for the r12 operators — the shapes the docstrings promise:

- Singer record parse stays executor-side: the capture text scan feeds
  get_json_object/from_json projections with NO driver collect in the
  record path, and the PK last-wins window partitions BY PK (never a
  SinglePartition window over the capture);
- the domain-cap admitter's budget join is a PLAIN join against the
  parquet budget table (broadcast only if AQE elects it at runtime —
  the plan must not hard-pin a driver-side broadcast of O(domains));
- the streaming KS fold is ONE (segment, bucket)-grouped aggregate with
  a broadcast edge join (metadata-side), partial aggregation upstream.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pipelinewise_spark.sources.singer import (
    _last_wins,
    capture_lines,
    stream_records,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _capture(tmp_path, n=200):
    lines = [json.dumps({
        "type": "SCHEMA", "stream": "t",
        "schema": {"type": "object", "properties": {
            "id": {"type": ["null", "integer"]},
            "v": {"type": ["null", "number"]},
        }},
        "key_properties": ["id"],
    })]
    for i in range(n):
        lines.append(json.dumps({
            "type": "RECORD", "stream": "t",
            "record": {"id": i % 50, "v": float(i)},
        }))
    p = tmp_path / "cap.ndjson"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_singer_record_parse_is_executor_side(spark, tmp_path):
    from pipelinewise_spark.schema.jsonschema import json_schema_to_struct

    cap = _capture(tmp_path)
    struct = json_schema_to_struct({
        "type": "object",
        "properties": {"id": {"type": ["null", "integer"]},
                       "v": {"type": ["null", "number"]}},
    })
    recs = stream_records(spark, cap, "t", struct)
    plan = _plan(recs)
    # the record path is scan -> window(lineno) -> filter -> project:
    # JSON parsing lives in the projection (from_json/get_json_object),
    # no collect/limit nodes, and the lineno window partitions per FILE
    assert "from_json" in plan
    assert "CollectLimit" not in plan
    assert "file_path" in plan  # per-file lineno window partition key
    deduped = _last_wins(recs, ["id"])
    dplan = _plan(deduped)
    # PK last-wins partitions by the PK — never SinglePartition
    assert "partitionBy" not in dplan or "id" in dplan
    assert "SinglePartition" not in dplan
    assert deduped.count() == 50  # 200 records, 50 PKs, last wins


def test_admitter_budget_join_is_not_hardcoded_broadcast(spark, tmp_path):
    """The r12 scale fix: the admit join must leave strategy choice to
    the planner/AQE (a hard F.broadcast pin would materialize an
    O(domains) table on the driver at web-crawl domain counts). With
    AQE off and a parquet budget table present, the plan may pick any
    join, but the logical plan must carry NO broadcast HINT."""
    from pipelinewise_spark.functions.curation import (
        StreamingDomainCapAdmitter,
    )

    d = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % 5).cast("string")).alias("dom"),
    )
    adm = StreamingDomainCapAdmitter(
        "dom", "doc_id", cap=3,
        state_dir=str(tmp_path / "st"), out_dir=str(tmp_path / "out"),
    )
    adm.on_batch(d, 0)  # creates budgets/v=1
    used = adm.budgets(spark)
    batch = d.withColumn(
        "__rn",
        F.row_number().over(
            __import__("pyspark").sql.Window.partitionBy("dom")
            .orderBy("doc_id")
        ),
    )
    joined = batch.join(
        used, F.col("dom") == F.col("__dom"), "left"
    )
    logical = joined._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "hint" not in logical.lower()
    # and the REAL admit path produced the capped artifact
    assert adm.admitted(spark).count() == 15  # 5 domains x cap 3


def test_streaming_ks_fold_is_one_grouped_aggregate(spark, tmp_path):
    from pipelinewise_spark.operators.drift import (
        StreamingKSMonitor,
        _segment_bucket_counts,
    )

    ref = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("seg"),
        (F.col("id") % 40 + 1).cast("double").alias("v"),
    )
    mon = StreamingKSMonitor(
        ref, "v", ["k"], "seg", str(tmp_path / "st"), n_buckets=8
    )
    fold = _segment_bucket_counts(
        ref, mon.state["bounds"], "v", "seg", "n"
    )
    plan = _plan(fold)
    # one hash aggregate pair (partial + final) over a broadcast edge
    # join — map-side combinable, no window, no sort-based fallback
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan and "SinglePartition" not in plan
