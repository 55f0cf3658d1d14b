"""Pipeline runner — the engine's ``pipelinewise run_tap``.

The reference's run lifecycle (SURVEY §3.1): partition selected streams into
the bulk path (FastSync: initial/full loads) vs the record path (Singer:
incremental/CDC tails), run each, persist state after data is safely loaded.
Here both paths are Spark jobs over the same operators:

- FULL_TABLE            → full_table_sync (atomic swap)
- INCREMENTAL           → incremental_sync (bookmark MERGE); first run with
                          no bookmark behaves as the initial bulk load —
                          exactly the reference's fastsync-then-singer
                          handoff, minus the process juggling
- LOG_BASED             → run_cdc_stream over a change-event directory
                          (checkpoint = bookmark)

Streams are independent jobs; submit them concurrently on a cluster for the
reference's per-table parallelism (fastsync_parallelism) — the scheduler,
not a process Pool, does the fan-out.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from pipelinewise_spark.operators.sync import full_table_sync, incremental_sync
from pipelinewise_spark.operators.table import ParquetTable
from pipelinewise_spark.plans.spec import PipelineSpec, ReplicationMethod, StreamSpec
from pipelinewise_spark.plans.state import BookmarkStore


@dataclass
class StreamResult:
    tap_stream_id: str
    method: str
    rows_loaded: int
    bookmark: dict = field(default_factory=dict)


class PipelineRunner:
    def __init__(self, spark: SparkSession, spec: PipelineSpec):
        self.spark = spark
        self.spec = spec
        state_path = spec.state_path or os.path.join(
            spec.target_path, "_state.json"
        )
        self.state = BookmarkStore(state_path)

    def table_for(self, stream: StreamSpec) -> ParquetTable:
        return ParquetTable(
            os.path.join(self.spec.target_path, stream.target_table)
        )

    def run_stream(
        self, stream: StreamSpec, source_df: DataFrame,
        extracted_at=None, batched_at=None,
    ) -> StreamResult:
        # primary_key_required guard (reference default true:
        # target_snowflake/__init__.py:266-278) — PK-less streams may only
        # take the append path, and only when explicitly allowed
        pk_required = bool(
            stream.options.get(
                "primary_key_required",
                self.spec.options.get("primary_key_required", True),
            )
        )
        if (
            pk_required
            and not stream.primary_keys
            and stream.replication_method is not ReplicationMethod.FULL_TABLE
        ):
            raise ValueError(
                f"{stream.tap_stream_id}: no primary key — set "
                "primary_key_required: false to allow the append-only path"
            )
        table = self.table_for(stream)
        if stream.replication_method is ReplicationMethod.FULL_TABLE:
            out = full_table_sync(
                self.spark, source_df, stream, table, self.state,
                extracted_at=extracted_at, batched_at=batched_at,
            )
        elif stream.replication_method is ReplicationMethod.INCREMENTAL:
            out = incremental_sync(
                self.spark, source_df, stream, table, self.state,
                extracted_at=extracted_at, batched_at=batched_at,
            )
        else:
            raise ValueError(
                f"{stream.tap_stream_id}: LOG_BASED streams run via "
                "streaming.cdc.run_cdc_stream with a change-event source"
            )
        return StreamResult(
            tap_stream_id=stream.tap_stream_id,
            method=stream.replication_method.value,
            rows_loaded=out.count(),
            bookmark=self.state.get_bookmark(stream.tap_stream_id),
        )

    def run(
        self, sources: dict[str, DataFrame], extracted_at=None, batched_at=None
    ) -> list[StreamResult]:
        """Run every selected stream whose source DataFrame is provided."""
        results = []
        for stream in self.spec.streams:
            if stream.tap_stream_id not in sources:
                continue
            results.append(
                self.run_stream(
                    stream, sources[stream.tap_stream_id],
                    extracted_at=extracted_at, batched_at=batched_at,
                )
            )
        return results
