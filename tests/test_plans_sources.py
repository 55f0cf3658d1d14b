"""Unit tests: pipeline spec, bookmark store, file source bookmarks."""

from __future__ import annotations

import os
import time
from datetime import datetime

from pipelinewise_spark.plans.spec import PipelineSpec, ReplicationMethod
from pipelinewise_spark.plans.state import BookmarkStore
from pipelinewise_spark.sources.files import FileSource


def test_pipeline_spec_roundtrip(tmp_path):
    spec = PipelineSpec.from_dict(
        {
            "pipeline_id": "mysql_to_lake",
            "target_path": str(tmp_path),
            "streams": [
                {
                    "tap_stream_id": "public-orders",
                    "table_name": "orders",
                    "replication_method": "INCREMENTAL",
                    "replication_key": "updated_at",
                    "primary_keys": ["id"],
                    "transformations": [
                        {"field_id": "email", "type": "HASH"},
                        {
                            "field_id": "phone",
                            "type": "MASK-STRING-SKIP-ENDS-3",
                            "when": [{"column": "country", "equals": "GB"}],
                        },
                    ],
                    "hard_delete": True,
                }
            ],
        }
    )
    s = spec.stream("public-orders")
    assert s.replication_method is ReplicationMethod.INCREMENTAL
    assert s.target_table == "orders"
    assert s.transformations[1].when == [{"column": "country", "equals": "GB"}]
    assert s.hard_delete


def test_bookmark_store_atomic_roundtrip(tmp_path):
    p = str(tmp_path / "state.json")
    st = BookmarkStore(p)
    st.update("orders", {"replication_key": "updated_at",
                         "replication_key_value": "2026-01-01"})
    st.save()
    st2 = BookmarkStore(p)
    assert st2.get("orders", "replication_key_value") == "2026-01-01"
    assert st2.get("missing", "x", default=42) == 42


def test_file_source_modified_since(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.csv").write_text("id,v\n1,x\n")
    old = time.time() - 3600
    os.utime(d / "a.csv", (old, old))
    (d / "b.csv").write_text("id,v\n2,y\n")
    (d / "skip.txt").write_text("nope")

    src = FileSource(path=str(d), format="csv", pattern=r"\.csv$")
    assert [os.path.basename(p) for p in src.list_files()] == ["a.csv", "b.csv"]
    cutoff = datetime.utcfromtimestamp(old + 10)
    assert [os.path.basename(p) for p in src.list_files(cutoff)] == ["b.csv"]
    assert src.max_mtime() is not None


def test_file_source_read_with_metadata(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "m.csv").write_text("id,v\n1,x\n2,y\n")
    src = FileSource(path=str(d), format="csv")
    df = src.read(spark, with_source_metadata=True)
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]._sdc_source_file.endswith("m.csv")
    assert src.read(spark, modified_since=datetime.utcnow()) is None


def test_csv_sink_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from pipelinewise_spark.operators.sinks import write_csv_target
    from pipelinewise_spark.sources.files import FileSource, read_table
    from tests.conftest import SF_DIR

    nation = read_table(spark, SF_DIR, "nation").withColumn(
        "meta", F.struct(F.lit("x").alias("a"), F.lit(1).alias("b"))
    )
    out = str(tmp_path / "csv_out")
    write_csv_target(nation, out, compression=None)
    back = FileSource(path=out, format="csv").read(spark)
    assert back.count() == nation.count()
    # nested struct flattened with __ separator
    assert "meta__a" in back.columns and "meta__b" in back.columns


def test_bookmark_store_throttled_save(tmp_path):
    p = str(tmp_path / "state.json")
    st = BookmarkStore(p)
    # nothing dirty -> no write
    assert st.save_throttled() is False
    st.update("orders", {"replication_key_value": "1"})
    # first dirty write goes through (no prior save timestamp)
    assert st.save_throttled(min_interval_s=10) is True
    st.update("orders", {"replication_key_value": "2"})
    # within the interval and under max_pending -> deferred
    assert st.save_throttled(min_interval_s=10, max_pending=100) is False
    assert BookmarkStore(p).get("orders", "replication_key_value") == "1"
    # accumulation past max_pending forces the write despite the interval
    for i in range(99):
        st.set("orders", "replication_key_value", str(3 + i))
    assert st.save_throttled(min_interval_s=10, max_pending=100) is True
    assert BookmarkStore(p).get("orders", "replication_key_value") == "101"
    # the final unconditional save always flushes
    st.update("orders", {"replication_key_value": "x"})
    st.save()
    assert BookmarkStore(p).get("orders", "replication_key_value") == "x"
