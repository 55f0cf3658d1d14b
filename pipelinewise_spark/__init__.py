"""pipelinewise_spark — a PySpark-native data-pipeline / ELT engine.

A ground-up re-expression of the capabilities of transferwise/pipelinewise
(Singer.io tap→transform→target replication) on Apache Spark:

- streams are DataFrames; targets are parquet-snapshot tables with atomic swap
- replication methods: FULL_TABLE, INCREMENTAL (bookmark), LOG_BASED (CDC
  change-event DataFrames merged per micro-batch)
- masking transformations are Column expressions (Catalyst-optimizable)
- MERGE-by-PK upsert, last-wins in-batch dedupe, soft/hard delete
- schema evolution: add-column, version-column (rename on type change)
- beyond-reference: dedup (exact/MinHash-LSH/SimHash/Jaccard), ANN similarity
  search, text analysis, multimodal binary-column plumbing

Designed for 100 TB scale: declarative DataFrame plans (Catalyst handles
pushdown/pruning), broadcast for small dims, band-bucketed joins instead of
cross joins, no driver-side row loops.
"""

__version__ = "0.1.0"

from pipelinewise_spark.session import get_spark  # noqa: F401
