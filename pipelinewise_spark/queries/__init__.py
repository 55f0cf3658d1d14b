"""Named query registry — the driver-facing correctness surface.

Each entry pairs a Spark implementation (``QUERIES[name](spark, sf_dir) →
DataFrame``) with a DuckDB-executable oracle (``ORACLES[name]``) computing the
same result on the same parquet tables. Queries with no SQL-expressible oracle
(streaming, stateful) register with ``oracle=None`` and get a rows-only check.
"""

from pipelinewise_spark.queries.registry import ORACLES, QUERIES, register  # noqa: F401

# import for side effect: populates the registry
from pipelinewise_spark.queries import pipeline as _pipeline  # noqa: F401,E402
from pipelinewise_spark.queries import analytics as _analytics  # noqa: F401,E402
from pipelinewise_spark.queries import targets as _targets  # noqa: F401,E402
from pipelinewise_spark.queries import llmdata as _llmdata  # noqa: F401,E402
from pipelinewise_spark.queries import streaming as _streaming  # noqa: F401,E402
from pipelinewise_spark.queries import ops as _ops  # noqa: F401,E402

# Registry iteration order is the order external harnesses see (and a
# bounded harness may only sample a PREFIX of it). Lead with a
# representative cross-section of every operator family — sync/CDC,
# sinks/sources, masking, relational/window, streaming, lakehouse/scale
# machinery, LLM-data — rather than module import order, which would
# front-load one family and starve the rest.
_SHOWCASE_ORDER = [
    # replication core
    "full_table_sync_lineitem", "incremental_sync_orders",
    "partial_sync_orders", "cdc_stream_apply_orders", "pk_dedupe_events",
    "merge_soft_delete_orders",
    # sinks / sources (r5 rotation: orc roundtrip in; csv-lineno, the mask
    # variant trio, kafka-json, merge-hard-delete, schema-evolution,
    # rollup, topk, minhash-incremental all driver-green in r3/r4 and rest
    # on pytest now)
    "validate_events", "flatten_events_props", "orc_roundtrip_orders",
    "mongo_documents_normalize", "mongo_change_stream_apply",
    "kafka_protobuf_events",
    # transformations + validation routing
    "mask_transforms_customer", "quarantine_events",
    # relational / windows (all 22 TPC-H shapes are registered and were
    # driver-green in r03; q1/q3 stay as the flagship representatives.
    # r5.2 rotation: asof/range-join/windowed-counts/cosine-topk/curation-
    # pipeline went driver-green in r4 and rest on pytest; the five
    # never-driver-checked round-5 additions take their slots)
    "q1_pricing_summary", "q3_shipping_priority",
    "exact_quantiles_lineitem", "lang_percentile_filter_documents",
    "cross_doc_line_dedup_documents",
    "ntile_documents_by_length",
    # streaming
    "stream_dedupe_events", "stream_stream_join_attribution",
    "cdc_stream_mv_orders",
    # lakehouse / scale machinery
    "manifest_time_travel_orders",
    "snapshot_drift_orders", "incremental_mv_orders",
    "incremental_mv_minmax_orders", "zorder_pruned_read_orders",
    "bloom_point_lookup_orders",
    "salted_topk_events_per_user",
    # LLM training-data
    "exact_dedup_documents", "minhash_lsh_pairs_documents",
    "simhash_documents", "ngram_jaccard_pairs_documents",
    "edit_distance_pairs_documents", "dedup_clusters_documents",
    "dedup_keep_best_documents", "cluster_aware_split_documents",
    "weighted_sample_documents", "embedding_incremental_batch",
    "embedding_near_dup_pairs", "gopher_quality_documents",
    "curation_funnel_documents", "pack_sequences_documents",
    "bm25_documents", "multimodal_resize_images",
    # round-5 additions (never driver-checked; timestamp_clamp,
    # snapshot_diff, salted_agg, frequent_tokens rotate to pytest)
    "ngram_lm_score_documents", "bigram_lm_score_documents",
    "hybrid_retrieval_documents", "repeated_ngram_coverage_documents",
]


def _reorder() -> None:
    missing = [n for n in _SHOWCASE_ORDER if n not in QUERIES]
    assert not missing, f"showcase order names unknown queries: {missing}"
    ordered = {n: QUERIES[n] for n in _SHOWCASE_ORDER}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o)


_reorder()
