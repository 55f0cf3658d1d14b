"""Round-5.2 plan + operator assertions: the new curation/dedup operators
must keep their promised scale shapes — no single-reducer windows over the
line vocabulary, no stratum-wide windows, corpus self-pairs never formed.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from pipelinewise_spark.queries import QUERIES


def _plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_cross_doc_dedup_no_window_over_lines(spark, sf_dir):
    """The per-line winner must come from a map-side-combinable groupBy
    min, not a row_number window partitioned by the line (whose Zipf head
    would single-task): no Window node keyed by the normalized line."""
    df = QUERIES["cross_doc_line_dedup_documents"](spark, sf_dir)
    plan = _plan_of(df)
    assert "SinglePartition" not in plan, plan
    # winner aggregation appears as partial+final hash aggregate on __norm
    assert "min(" in plan and "__norm" in plan, plan
    win_lines = [
        ln for ln in plan.splitlines() if "Window" in ln and "__norm" in ln
    ]
    assert not win_lines, win_lines


def test_cross_doc_dedup_first_doc_keeps_everything(spark, sf_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["cross_doc_line_dedup_documents"](
            spark, sf_dir
        ).collect()
    }
    first = out[min(out)]
    assert first["n_lines_removed"] == 0
    # totals: every line is either kept (exactly one doc per norm) or removed
    assert all(
        r["n_lines_kept"] + r["n_lines_removed"] >= 2 for r in out.values()
    )


def test_lang_percentile_no_single_partition_exchange(spark, sf_dir):
    df = QUERIES["lang_percentile_filter_documents"](spark, sf_dir)
    plan = _plan_of(df)
    assert "SinglePartition" not in plan, plan
    # the global rank's range shuffle lives inside the checkpointed prefix
    # (distributed_row_number materializes it once); downstream the
    # per-language bounds broadcast — no stratum-wide window anywhere
    assert "localCheckpoint" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_lang_percentile_bounds_per_lang(spark, sf_dir):
    rows = QUERIES["lang_percentile_filter_documents"](
        spark, sf_dir
    ).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["lang_pct"])
    for lang, pcts in by_lang.items():
        assert min(pcts) >= 0.25, lang
        assert max(pcts) <= 1.0, lang


def test_curation_funnel_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["curation_funnel_documents"](spark, sf_dir).collect(),
        key=lambda r: r["stage_id"],
    )
    assert [r["stage"] for r in rows] == [
        "ingested", "word_count", "gopher_quality", "exact_dedup",
    ]
    # each stage's input is the previous stage's output, counts only shrink
    for prev, cur in zip(rows, rows[1:]):
        assert cur["rows_in"] == prev["rows_out"]
        assert cur["rows_out"] <= cur["rows_in"]


def test_embedding_incremental_no_corpus_self_pairs(spark, sf_dir):
    rows = QUERIES["embedding_incremental_batch"](spark, sf_dir).collect()
    for r in rows:
        assert r["a_id"] % 10 != 0, r  # left side always corpus
        assert r["b_id"] % 10 == 0, r  # right side always batch


def test_embedding_incremental_subset_of_full_pairs(spark, sf_dir):
    """Every incremental pair must also be found by the full-corpus
    near-dup run (same planes, same threshold) — the index is the same,
    only the candidate restriction differs."""
    full = {
        tuple(sorted((r["a_id"], r["b_id"])))
        for r in QUERIES["embedding_near_dup_pairs"](spark, sf_dir).collect()
    }
    inc = {
        tuple(sorted((r["a_id"], r["b_id"])))
        for r in QUERIES["embedding_incremental_batch"](
            spark, sf_dir
        ).collect()
    }
    cross = {p for p in full if (p[0] % 10 == 0) != (p[1] % 10 == 0)}
    assert inc == cross


def test_streaming_dedupe_batch_path_equivalence(spark, sf_dir):
    """streaming_dedupe on a batch frame = plain dropDuplicates — one call
    site serves stream and batch."""
    from pipelinewise_spark.sources.files import read_table
    from pipelinewise_spark.streaming.windows import streaming_dedupe

    e = read_table(spark, sf_dir, "events")
    doubled = e.union(e)
    out = streaming_dedupe(doubled, ["event_id"])
    assert out.count() == e.count()
