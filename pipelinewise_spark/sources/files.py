"""File-based sources (parquet / CSV / JSONL) — the S3-CSV tap re-expressed.

Reference behavior (tap-s3-csv): list bucket objects by prefix + regex, keep
files with ``last_modified > modified_since`` bookmark, sort by mtime, stream
rows, add ``_sdc_source_bucket/_sdc_source_file/_sdc_source_lineno`` columns,
infer schema from a sample (/root/reference/singer-connectors/tap-s3-csv/
tap_s3_csv/s3.py:205-310, 73-126; sync.py:17-99, 84-91).

Spark-first shape: ``spark.read`` over the matched paths — the file listing
is metadata work (driver-side, cheap); row data never touches the driver.
``_sdc_source_file`` comes from the hidden ``_metadata`` column so it is
computed in the scan, not with a UDF. Line numbers are per-file positions —
we expose them only for line-based formats (CSV/JSONL) where a per-partition
zip is exact because Spark preserves line order within a file split chain.
"""

from __future__ import annotations

import fnmatch
import os
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class FileSource:
    """One logical stream backed by files under a directory/bucket prefix."""

    path: str  # directory (local or s3a://bucket/prefix)
    format: str = "parquet"  # parquet | csv | json | binary | xml | orc
    pattern: str | None = None  # regex on file name (reference: search_pattern)
    options: dict[str, str] = field(default_factory=dict)

    def list_files(self, modified_since: datetime | None = None) -> list[str]:
        """Driver-side listing with the mtime bookmark filter, sorted by mtime
        (reference sorts so the bookmark advances monotonically)."""
        rx = re.compile(self.pattern) if self.pattern else None
        out: list[tuple[float, str]] = []
        for dirpath, _dirs, names in os.walk(self.path):
            for n in sorted(names):
                if n.startswith(("_", ".")):
                    continue
                if rx and not rx.search(n):
                    continue
                p = os.path.join(dirpath, n)
                mtime = os.path.getmtime(p)
                if modified_since is not None:
                    ms = modified_since
                    if ms.tzinfo is not None:
                        ms = ms.astimezone(timezone.utc).replace(tzinfo=None)
                    if datetime.utcfromtimestamp(mtime) <= ms:
                        continue
                out.append((mtime, p))
        out.sort()
        return [p for _, p in out]

    def read(
        self,
        spark: SparkSession,
        modified_since: datetime | None = None,
        with_source_metadata: bool = False,
    ) -> DataFrame | None:
        """Read matched files; None when the bookmark filters everything out."""
        files = self.list_files(modified_since)
        if not files:
            return None
        fmt = "binaryFile" if self.format == "binary" else self.format
        reader = spark.read.format(fmt).options(**self.options)
        if self.format == "csv":
            reader = reader.option("header", self.options.get("header", "true"))
            reader = reader.option(
                "inferSchema", self.options.get("inferSchema", "true")
            )
        df = reader.load(files)
        if with_source_metadata:
            meta = [
                F.col("_metadata.file_path").alias("_sdc_source_file"),
                F.lit(os.path.abspath(self.path)).alias("_sdc_source_bucket"),
            ]
            if self.format in ("csv", "json"):
                # Per-file line number (reference sync.py:89 emits
                # records_synced + 2: header CSVs put record 1 on line 2).
                # Ordering inside one split is the file's physical line order;
                # across splits of one file, file_block_start orders them —
                # a per-file window, the minimum coordination lineno needs.
                from pyspark.sql import Window

                header = (
                    self.format == "csv"
                    and self.options.get("header", "true") == "true"
                )
                w = Window.partitionBy(F.col("_metadata.file_path")).orderBy(
                    F.col("_metadata.file_block_start"),
                    F.monotonically_increasing_id(),
                )
                meta.append(
                    (F.row_number().over(w) + F.lit(1 if header else 0)).alias(
                        "_sdc_source_lineno"
                    )
                )
            df = df.select("*", *meta)
        return df

    def max_mtime(self) -> datetime | None:
        files = self.list_files()
        if not files:
            return None
        return datetime.utcfromtimestamp(max(os.path.getmtime(p) for p in files))


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) (Spark reads them as
    long when spark.sql.legacy.parquet.nanosAsLong=true). Footer-only check."""
    import pyarrow.parquet as pq

    out = []
    try:
        schema = pq.read_schema(path)
    except Exception:  # directory dataset / remote: sample one footer
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
    for f in schema:
        if str(f.type) == "timestamp[ns]":
            out.append(f.name)
    return out


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated test table (TESTDATA.md layout).

    Timestamp normalization (driver-session-proof): the test parquet has
    shipped with both TIMESTAMP(NANOS) (read as long nanos under the legacy
    conf) and TIMESTAMP_NTZ(MICROS) columns across rounds. Downstream
    operators use instant functions (unix_millis, session_window, stream
    watermarks) that require TIMESTAMP, so every wall-clock column is
    normalized here to µs-precision TIMESTAMP with the session pinned to UTC
    (wall time == instant, matching DuckDB's naive-timestamp read of the same
    files). Pipelines run in UTC, same contract as the reference
    (pipelinewise/fastsync/commons/utils.py uses UTC throughout).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_timestamp_columns(path)
    # Both confs are runtime-settable; the driver's vanilla session doesn't
    # run our session.py, so set them here (idempotent).
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # integer div: ns magnitudes (~1.7e18) would lose precision as double
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    for f in df.schema.fields:
        # NTZ wall time -> instant at UTC; cast is exact (both µs precision)
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def glob_tables(sf_dir: str) -> list[str]:
    return sorted(
        os.path.splitext(n)[0]
        for n in os.listdir(sf_dir)
        if fnmatch.fnmatch(n, "*.parquet")
    )
