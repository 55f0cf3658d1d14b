"""Persisted inverted text index (functions/textindex.py)."""

from __future__ import annotations

import os
import zlib

import pyspark.sql.functions as F

from pipelinewise_spark.functions.retrieval import bm25_scores
from pipelinewise_spark.functions.textindex import (
    N_BUCKETS,
    build_text_index,
    compact_text_index,
    extend_text_index,
    search_text_index,
    text_index_status,
    vacuum_text_index,
)
from pipelinewise_spark.sources.files import read_table


def test_index_serves_exact_bm25(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    idx = os.path.join(str(tmp_path), "idx")
    build_text_index(docs, idx, "doc_id", "text")
    terms = ["data", "pipeline", "spark"]
    served = {
        r["doc_id"]: r["score"]
        for r in search_text_index(spark, idx, terms).collect()
    }
    direct = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, "doc_id", "text", terms).collect()
    }
    assert served == direct  # bit-identical, not approximately equal


def test_probe_reads_only_query_buckets(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    idx = os.path.join(str(tmp_path), "idx")
    build_text_index(docs, idx, "doc_id", "text")
    df = search_text_index(spark, idx, ["data"])
    bk = zlib.crc32(b"data") % N_BUCKETS
    files = df.inputFiles()
    # the scan lists exactly the one query bucket dir, never the corpus
    # or the postings root
    assert files and all(f"bucket={bk}/" in f for f in files)


def test_extend_matches_full_build(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    terms = ["data", "pipeline", "spark"]
    full = os.path.join(str(tmp_path), "full")
    build_text_index(docs, full, "doc_id", "text")
    grown = os.path.join(str(tmp_path), "grown")
    build_text_index(
        docs.filter(F.col("doc_id") % 3 == 0), grown, "doc_id", "text"
    )
    extend_text_index(docs.filter(F.col("doc_id") % 3 == 1), grown)
    extend_text_index(docs.filter(F.col("doc_id") % 3 == 2), grown)
    a = sorted(search_text_index(spark, full, terms).collect())
    b = sorted(search_text_index(spark, grown, terms).collect())
    assert a == b  # growth path converges to the full build exactly


def test_unindexed_terms_return_empty(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    idx = os.path.join(str(tmp_path), "idx")
    build_text_index(docs, idx, "doc_id", "text")
    assert search_text_index(spark, idx, ["zzzqqqxxx"]).count() == 0


def test_compact_preserves_search_and_bounds_fragments(
    spark, sf_dir, tmp_path
):
    """Maintenance lifecycle (r8): compaction must leave search results
    bit-identical while consolidating per-extend fragment files; vacuum
    removes the superseded dirs; status surfaces the staleness signal a
    maintenance loop thresholds on."""
    docs = read_table(spark, sf_dir, "documents")
    idx = os.path.join(str(tmp_path), "idx")
    terms = ["data", "pipeline", "spark"]
    build_text_index(
        docs.filter(F.col("doc_id") % 4 == 0), idx, "doc_id", "text"
    )
    for m in (1, 2, 3):
        extend_text_index(docs.filter(F.col("doc_id") % 4 == m), idx)

    st0 = text_index_status(idx)
    assert st0["extensions"] == 3
    assert st0["extensions_since_compaction"] == 3
    before = sorted(search_text_index(spark, idx, terms).collect())

    meta = compact_text_index(spark, idx)
    assert meta["compactions"] == 1
    st1 = text_index_status(idx)
    assert st1["extensions_since_compaction"] == 0
    assert st1["n_docs"] == st0["n_docs"]
    assert st1["fragment_files"] < st0["fragment_files"]

    after = sorted(search_text_index(spark, idx, terms).collect())
    assert after == before  # bit-identical scores across compaction

    removed = vacuum_text_index(idx)
    assert removed == ["postings-0000"]
    assert sorted(search_text_index(spark, idx, terms).collect()) == before

    # the whole compacted corpus still equals a one-shot full build
    full = os.path.join(str(tmp_path), "full")
    build_text_index(docs, full, "doc_id", "text")
    assert sorted(search_text_index(spark, full, terms).collect()) == before
