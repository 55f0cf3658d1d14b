"""Tail-follow Singer capture consumption — ``tap | engine`` pipe parity.

The reference pipes a tap's stdout straight into the target process
(cli/commands.py:346-355 builds exactly that shell pipe); a long-running
tap therefore produces its capture CONTINUOUSLY. The batch faces in
sources/singer.py consume a finished capture file; this module consumes
a GROWING capture directory with Structured Streaming: the tap's stdout
is tee'd/rotated into sequentially named NDJSON files
(``cap-000001.ndjson``, ``cap-000002.ndjson``, ...) and every
micro-batch applies its slice with the same per-stream semantics:

- a global record sequence ``<file name>:<zero-padded lineno>`` orders
  lines exactly as the capture was written (file names MUST sort
  lexicographically in write order — what any rotating tee produces;
  zero-pad the rotation counter);
- per stream and per SCHEMA epoch inside the batch: records parse
  DISTRIBUTED (``from_json``), PK last-wins by sequence, and MERGE with
  the persisted sequence as the staleness guard — so a micro-batch
  replayed after a crash, or files listed out of order by the file
  source, can never roll a row back: the final table state is
  last-wins by global capture position, idempotently;
- no-PK (append-only) streams anti-join on the persisted sequence
  before appending — idempotent under batch replay too;
- SCHEMA drift evolves the target exactly like the batch paths:
  add-column via the merge's union-of-columns NULL-fill, incompatible
  type change via ``version_column``
  (target_snowflake/db_sync.py:849-870);
- ``ACTIVATE_VERSION`` purges older-version rows (full-resync swap);
- the max-sequence STATE becomes the bookmark, persisted in a sidecar
  only AFTER its batch's data landed — the reference's flushed_state
  discipline (target_snowflake/__init__.py:323-416) at micro-batch
  granularity: a bookmark never runs ahead of unlanded records.

Driver state is BOUNDED: per batch only the control lines (capped at
``max_control_lines``) and the schema-registry sidecar; record payloads
and sequence values stay executor-side end to end — the faithful batch
replay's O(records) driver index does not exist on this path.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipelinewise_spark.streaming.bounded import await_bounded
from pipelinewise_spark.sources.singer import (
    SDC_EXTRACTED_AT,
    SDC_TABLE_VERSION,
    _apply_activate,
    _evolved_target,
    _last_wins,
    _mor_aligned,
    record_payload_cols,
)

#: global capture position persisted into the target — the MERGE
#: staleness guard (string ``<file>:<zero-padded lineno>``)
SDC_SEQUENCE = "_sdc_sequence"

_STATE_FILE = "singer_state.json"


@dataclass
class CaptureStreamState:
    """The sidecar the stream carries across micro-batches (and across
    restarts): the schema registry + the flushed bookmark. Written
    atomically (tmp + rename) AFTER a batch's data lands."""

    schemas: dict[str, dict] = field(default_factory=dict)
    key_properties: dict[str, list[str]] = field(default_factory=dict)
    activations: dict[str, int] = field(default_factory=dict)
    bookmark: dict | None = None
    bookmark_seq: str | None = None
    last_batch: int = -1
    #: capture position of each stream's ADOPTED schema — control-plane
    #: adoption is sequence-guarded like the bookmark, so a late-listed
    #: older file cannot regress the registry (absent for pre-r13
    #: sidecars; treated as "always adopt", the old behavior)
    schema_seq: dict[str, str] = field(default_factory=dict)

    @classmethod
    def load(cls, checkpoint_dir: str) -> "CaptureStreamState":
        p = os.path.join(checkpoint_dir, _STATE_FILE)
        if not os.path.exists(p):
            return cls()
        with open(p, encoding="utf-8") as fh:
            d = json.load(fh)
        return cls(**d)

    def save(self, checkpoint_dir: str) -> None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=checkpoint_dir)
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(self.__dict__, fh)
        os.replace(tmp, os.path.join(checkpoint_dir, _STATE_FILE))


def _sequenced_lines(batch: DataFrame) -> DataFrame:
    """(line, __seq) for one micro-batch — the global capture position:
    file basename (names sort in write order by contract) + the
    physical line number inside the file, zero-padded so the string
    order IS the numeric order."""
    fname = F.element_at(F.split(F.col("__file"), "/"), -1)
    w = Window.partitionBy("__file").orderBy(
        F.col("__block"), F.monotonically_increasing_id()
    )
    return batch.select(
        F.col("value").alias("line"),
        F.concat(
            fname, F.lit(":"),
            F.lpad(F.row_number().over(w).cast("string"), 12, "0"),
        ).alias("__seq"),
    )


def _segment_records(
    lines: DataFrame,
    stream: str,
    struct: T.StructType,
    lo: str | None,
    hi: str | None,
) -> DataFrame:
    """This stream's RECORD payloads in the (lo, hi) sequence window,
    parsed distributed — the streaming twin of
    sources/singer.py:stream_records."""
    cond = (F.get_json_object("line", "$.type") == "RECORD") & (
        F.get_json_object("line", "$.stream") == stream
    )
    if lo is not None:
        cond = cond & (F.col("__seq") > F.lit(lo))
    if hi is not None:
        cond = cond & (F.col("__seq") < F.lit(hi))
    return lines.filter(cond).select(
        F.col("__seq").alias(SDC_SEQUENCE),
        *record_payload_cols(struct),
    ).select(SDC_SEQUENCE, SDC_TABLE_VERSION, SDC_EXTRACTED_AT, "__r.*")


def _last_wins_by_seq(df: DataFrame, pks: list[str]) -> DataFrame:
    return _last_wins(df, pks, order_col=SDC_SEQUENCE)


def apply_capture_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_root: str,
    state: CaptureStreamState,
    *,
    float_compat: bool = False,
    primary_key_required: bool = True,
    version_suffix: str | None = None,
    max_control_lines: int = 100_000,
    target_format: str = "parquet",
) -> CaptureStreamState:
    """Apply one micro-batch of capture lines (columns ``value``,
    ``__file``, ``__block``) and return the advanced state. Idempotent:
    re-applying the same batch (a crash-replayed micro-batch) leaves
    the tables unchanged — PK merges are guarded on the persisted
    sequence, appends anti-join on it, AV purges and sidecar writes are
    naturally re-runnable.

    ``target_format``:

    - ``"parquet"`` (default): each flush MERGEs copy-on-write into a
      plain ParquetTable — simple files, but per-batch write cost is
      O(target). Right for bounded runs and small tables.
    - ``"mor"``: targets are ManifestTables and each flush lands as a
      merge-on-read delta (superseded rows deletion-vectored, batch
      appended as new files, ``_sdc_sequence`` as the staleness
      guard) — per-batch write cost is O(batch) + an answer-sized
      sidecar, NOT O(target). This is the long-running tail-follow
      answer: a tap trickling micro-batches into a 100 TB table for
      months must not rewrite the table per batch. Schema drift
      (added column / type change) falls back to one copy-on-write
      evolution rewrite for that segment, then resumes MOR;
      ACTIVATE_VERSION purges via an answer-sized ``delete_where``;
      ``compact`` (the ManifestTable lever) converts accumulated read
      debt back into clean files on whatever cadence ops chooses."""
    from pipelinewise_spark.operators.merge import merge_upsert
    from pipelinewise_spark.operators.table import ParquetTable
    from pipelinewise_spark.schema.jsonschema import json_schema_to_struct

    if target_format not in ("parquet", "mor"):
        raise ValueError(
            f"unknown target_format {target_format!r} — "
            "expected 'parquet' or 'mor'"
        )
    mor = target_format == "mor"
    if mor:
        from pipelinewise_spark.operators.manifest_table import (
            ManifestTable,
        )

    lines = _sequenced_lines(batch).persist()
    try:
        ctl = (
            lines.select(
                "__seq",
                F.get_json_object("line", "$.type").alias("t"),
                "line",
            )
            .filter(F.col("t").isNull() | (F.col("t") != "RECORD"))
            .orderBy("__seq")
            .limit(max_control_lines + 1)
            .collect()
        )
        if len(ctl) > max_control_lines:
            raise ValueError(
                f"micro-batch has more than {max_control_lines} control "
                "(non-RECORD) lines — raise max_control_lines or shrink "
                "maxFilesPerTrigger"
            )
        events: list[tuple[str, str, dict]] = []
        for r in ctl:
            o = json.loads(r["line"])
            t = o.get("type")
            if t is None:
                raise ValueError(
                    f"capture line missing 'type': {r['line'][:200]}"
                )
            if t not in ("SCHEMA", "STATE", "ACTIVATE_VERSION"):
                raise ValueError(f"unknown Singer message type {t!r}")
            events.append((r["__seq"], t, o))

        # record streams present in this batch (to catch RECORD-before-
        # SCHEMA and to skip untouched streams below)
        rec_streams = {
            r["s"]
            for r in lines.filter(
                F.get_json_object("line", "$.type") == "RECORD"
            )
            .select(
                F.get_json_object("line", "$.stream").alias("s")
            )
            .distinct()
            .collect()
        }

        # per-stream control timelines for this batch
        schema_events: dict[str, list[tuple[str, dict]]] = {}
        av_events: dict[str, list[tuple[str, int]]] = {}
        state_events: list[tuple[str, dict]] = []
        for seq, t, o in events:
            if t == "SCHEMA":
                stream = o["stream"]
                kp = o.get("key_properties")
                if primary_key_required and not kp:
                    raise ValueError(
                        f"SCHEMA for stream {stream!r} has no "
                        "key_properties (primary_key_required) — pass "
                        "primary_key_required=False for append-only "
                        "streams"
                    )
                schema_events.setdefault(stream, []).append(
                    (seq, o)
                )
            elif t == "ACTIVATE_VERSION":
                av_events.setdefault(o["stream"], []).append(
                    (seq, int(o["version"]))
                )
            else:
                state_events.append((seq, o["value"]))

        touched = sorted(
            rec_streams | set(schema_events) | set(av_events)
        )
        for stream in touched:
            sch = list(schema_events.get(stream, []))
            if stream not in state.schemas:
                if not sch:
                    raise ValueError(
                        f"RECORD for stream {stream!r} before its SCHEMA"
                    )
                first_seq = sch[0][0]
                early = (
                    lines.filter(
                        (F.get_json_object("line", "$.type") == "RECORD")
                        & (
                            F.get_json_object("line", "$.stream")
                            == stream
                        )
                        & (F.col("__seq") < F.lit(first_seq))
                    )
                    .limit(1)
                    .collect()
                )
                if early:
                    raise ValueError(
                        f"RECORD for stream {stream!r} before its SCHEMA"
                    )
            # epoch boundaries inside this batch: carry-in schema, then
            # each SCHEMA line; AV events split segments too so the
            # purge lands at its capture position
            boundaries: list[tuple[str, str, Any]] = [
                (seq, "SCHEMA", o) for seq, o in sch
            ] + [
                (seq, "AV", v) for seq, v in av_events.get(stream, [])
            ]
            boundaries.sort(key=lambda e: e[0])
            cur_schema = state.schemas.get(stream)
            cur_kp = state.key_properties.get(stream, [])
            table = (
                ManifestTable(f"{target_root}/{stream}")
                if mor
                else ParquetTable(f"{target_root}/{stream}")
            )

            def flush_segment(lo: str | None, hi: str | None) -> None:
                if cur_schema is None:
                    return
                struct = json_schema_to_struct(cur_schema, float_compat)
                seg = _segment_records(lines, stream, struct, lo, hi)
                if stream in state.activations:
                    seg = _apply_activate(
                        seg, state.activations[stream]
                    )
                pks = cur_kp
                if pks:
                    seg = _last_wins_by_seq(seg, pks)
                    if seg.limit(1).count() == 0:
                        return
                    if not table.exists():
                        table.overwrite(seg)
                        return
                    aligned = (
                        _mor_aligned(spark, table, seg)
                        if mor else None
                    )
                    if aligned is not None:
                        # delta-bound: superseded rows are deletion-
                        # vectored, the batch appends as new files —
                        # no partition rewrite, same sequence guard
                        table.merge_on_read(
                            spark, aligned, pks,
                            guard_col=SDC_SEQUENCE,
                        )
                        return
                    target = _evolved_target(
                        spark, table, seg, pks, version_suffix
                    )
                    merged = merge_upsert(
                        target, seg, pks, guard_col=SDC_SEQUENCE
                    )
                else:
                    if seg.limit(1).count() == 0:
                        return
                    if not table.exists():
                        table.overwrite(seg)
                        return
                    aligned = (
                        _mor_aligned(spark, table, seg)
                        if mor else None
                    )
                    if aligned is not None:
                        # idempotent append: anti-join on the batch's
                        # own sequence window (footer stats prune the
                        # scan to overlapping files)
                        seg = aligned
                        smin, smax = seg.agg(
                            F.min(SDC_SEQUENCE), F.max(SDC_SEQUENCE)
                        ).first()
                        prev = (
                            table.read(spark)
                            .select(SDC_SEQUENCE)
                            .filter(
                                (F.col(SDC_SEQUENCE) >= smin)
                                & (F.col(SDC_SEQUENCE) <= smax)
                            )
                        )
                        fresh = seg.join(
                            prev, SDC_SEQUENCE, "left_anti"
                        )
                        if fresh.limit(1).count() > 0:
                            table.append(fresh)
                        return
                    prev = _evolved_target(
                        spark, table, seg, [], version_suffix
                    )
                    fresh = seg.join(
                        prev.select(SDC_SEQUENCE),
                        SDC_SEQUENCE,
                        "left_anti",
                    )
                    merged = prev.unionByName(
                        fresh, allowMissingColumns=True
                    )
                table.overwrite(merged)

            lo: str | None = None
            last_schema_seq: str | None = None
            for seq, kind, payload in boundaries:
                flush_segment(lo, seq)
                lo = seq
                if kind == "SCHEMA":
                    # in-batch epoch swap: records after this boundary
                    # IN THIS BATCH parse under it regardless of the
                    # registry guard below (they belong to this epoch)
                    cur_schema = payload["schema"]
                    cur_kp = list(payload.get("key_properties") or [])
                    last_schema_seq = seq
                else:  # AV: purge older-version rows already in the table
                    v_new = int(payload)
                    v_cur = state.activations.get(stream)
                    if v_cur is not None and v_new <= v_cur:
                        # a late-listed older AV is subsumed by the
                        # purge already executed — adopting it would
                        # resurrect purged versions in later segments
                        continue
                    state.activations[stream] = v_new
                    if table.exists():
                        if mor:
                            # answer-sized deletion vectors, no rewrite
                            vc = F.col(SDC_TABLE_VERSION)
                            table.delete_where(
                                spark,
                                vc.isNotNull() & (vc < v_new),
                            )
                        else:
                            table.overwrite(
                                _apply_activate(
                                    table.read(spark), v_new
                                )
                            )
            flush_segment(lo, None)
            if cur_schema is not None:
                # registry adoption is sequence-guarded (same rule as
                # the bookmark): an out-of-order older file's SCHEMA
                # governs ITS OWN batch's segments above but cannot
                # regress what later batches parse with
                prev_seq = state.schema_seq.get(stream)
                if last_schema_seq is None:
                    # carry-in only — re-persisting the same registry
                    # entry (no SCHEMA line in this batch)
                    state.schemas[stream] = cur_schema
                    state.key_properties[stream] = cur_kp
                elif prev_seq is None or last_schema_seq >= prev_seq:
                    state.schemas[stream] = cur_schema
                    state.key_properties[stream] = cur_kp
                    state.schema_seq[stream] = last_schema_seq

        # flushed_state at micro-batch granularity: everything in this
        # batch landed above, so the batch's max-sequence STATE is safe
        # to adopt (never a STATE from a position not yet applied)
        if state_events:
            seq, value = max(state_events, key=lambda e: e[0])
            if state.bookmark_seq is None or seq > state.bookmark_seq:
                state.bookmark = value
                state.bookmark_seq = seq
        return state
    finally:
        lines.unpersist()


def start_capture_stream(
    spark: SparkSession,
    capture_dir: str,
    target_root: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    float_compat: bool = False,
    primary_key_required: bool = True,
    version_suffix: str | None = None,
    max_control_lines: int = 100_000,
    bookmarks: Any | None = None,
    target_format: str = "parquet",
    compact_every: int | None = None,
):
    """Start the tail-follow stream over a growing capture directory.

    ``available_now=True`` bounds the run to the files present at start
    (the reference's bounded tap run); a deployment tailing a live tap
    re-launches on a schedule or uses ``available_now=False`` with a
    processing-time trigger. ``max_files_per_trigger`` caps each
    micro-batch (and is how the equivalence tests force multi-batch
    runs). Returns the StreamingQuery.

    ``compact_every=N`` (MOR targets only) runs ManifestTable.compact
    on every touched stream after every Nth micro-batch — the
    read-debt lever scheduled inside the tail loop instead of a
    separate cron: MOR accumulates one small file + deletion vectors
    per batch, and compaction folds them back into clean files
    (healthy partitions carry over by reference, so a compaction pass
    right after a delta batch is near-free). Safe under crash/replay:
    compaction never changes row content, only file layout."""
    if compact_every is not None:
        if target_format != "mor":
            raise ValueError(
                "compact_every needs target_format='mor' — parquet "
                "targets rewrite per batch and never fragment"
            )
        if compact_every < 1:
            raise ValueError(
                f"compact_every must be >= 1, got {compact_every}"
            )
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    src = reader.text(capture_dir).select(
        "value",
        F.col("_metadata.file_path").alias("__file"),
        F.col("_metadata.file_block_start").alias("__block"),
    )

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        state = CaptureStreamState.load(checkpoint_dir)
        state = apply_capture_batch(
            spark,
            batch_df,
            target_root,
            state,
            float_compat=float_compat,
            primary_key_required=primary_key_required,
            version_suffix=version_suffix,
            max_control_lines=max_control_lines,
            target_format=target_format,
        )
        state.last_batch = batch_id
        if (
            compact_every is not None
            and batch_id % compact_every == compact_every - 1
        ):
            from pipelinewise_spark.operators.manifest_table import (
                ManifestTable,
            )

            for stream in state.schemas:
                t = ManifestTable(f"{target_root}/{stream}")
                if t.exists():
                    t.compact(spark, max_dead_ratio=0.2)
        state.save(checkpoint_dir)
        if bookmarks is not None and state.bookmark is not None:
            for stream, bm in (
                state.bookmark.get("bookmarks") or {}
            ).items():
                bookmarks.update(stream, dict(bm))
            bookmarks.save()

    writer = src.writeStream.foreachBatch(_on_batch).option(
        "checkpointLocation", os.path.join(checkpoint_dir, "spark")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sync_capture_dir(
    spark: SparkSession,
    capture_dir: str,
    target_root: str,
    checkpoint_dir: str,
    **kwargs: Any,
) -> CaptureStreamState:
    """Convenience: consume everything currently in ``capture_dir``
    (availableNow) and return the final sidecar state. Re-invoking
    after more files land resumes from the checkpoint — the
    ``tap | engine`` tail-follow loop as a callable."""
    q = start_capture_stream(
        spark, capture_dir, target_root, checkpoint_dir,
        available_now=True, **kwargs,
    )
    await_bounded(q)
    return CaptureStreamState.load(checkpoint_dir)
