"""Session-wide cache lifetime registry.

Several operators ``persist()`` an intermediate frame because it feeds more
than one branch of the plan (e.g. shingle sets feeding both LSH band keys
and the verify join in :mod:`pipelinewise_spark.functions.dedup`). The
persist is correct for a single query, but a long-lived session that runs
many queries (the bench loop, the driver's correctness sweep, a production
ingest daemon) accumulates dead cached blocks in executor storage memory
unless something releases them — Spark only evicts under LRU pressure, and
``localCheckpoint`` blocks are only freed when the ContextCleaner sees the
last reference die.

Contract:

- every operator-owned ``persist()`` goes through :func:`register_cache`;
- a host process calls :func:`release_caches` between units of work
  (bench.py does this between queries; ``__spark_entry__`` wraps each
  driver callable the same way);
- callers that want tighter scoping still get explicit handles (the
  ``caches=[...]`` parameter on the incremental-LSH builder) or the
  context-manager form (:func:`pipelinewise_spark.functions.dedup.lsh_index`)
  — both unregister on unpersist so a later sweep never double-frees.

``release_caches`` also calls ``spark.catalog.clearCache()`` and nudges
both GCs so that lazily-referenced ``localCheckpoint`` RDD blocks (rank,
clusters, curation prefix sums) become collectable immediately instead of
at an arbitrary later GC point.
"""

from __future__ import annotations

import contextlib
import gc

from pyspark.sql import DataFrame, SparkSession

_LIVE: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Record a persisted frame for later bulk release; returns ``df``."""
    _LIVE.append(df)
    return df


def unregister_cache(df: DataFrame) -> None:
    """Drop a frame from the registry (caller released it explicitly)."""
    with contextlib.suppress(ValueError):
        _LIVE.remove(df)


def live_cache_count() -> int:
    return len(_LIVE)


def release_caches(spark: SparkSession | None = None, *, jvm_gc: bool = False) -> int:
    """Unpersist every registered frame; optionally clear the whole Spark
    cache and trigger GC so localCheckpoint blocks free now. Returns the
    number of frames released."""
    n = len(_LIVE)
    for df in _LIVE:
        with contextlib.suppress(Exception):
            df.unpersist()
    _LIVE.clear()
    if spark is not None:
        with contextlib.suppress(Exception):
            spark.catalog.clearCache()
        # Drop Python-side references first, then ask the JVM to collect so
        # the ContextCleaner can unregister orphaned RDD/broadcast blocks
        # (localCheckpoint materializations are held only by weak refs once
        # the plan objects die).
        gc.collect()
        if jvm_gc:
            with contextlib.suppress(Exception):
                spark.sparkContext._jvm.System.gc()
    return n
