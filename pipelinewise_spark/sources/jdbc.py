"""JDBC sources — PG/MySQL/Snowflake taps re-expressed as partitioned reads.

The reference's SQL taps run SELECTs with bookmark predicates through
server-side cursors (tap-postgres full_table.py:75-168, tap-mysql
full_table.py:31-179, incremental.py; FastSync exports
fastsync/commons/tap_mysql.py:327-501). On Spark all of that collapses into
``spark.read.jdbc`` with:

- column pruning + predicate pushdown (Catalyst pushes bookmark filters into
  the generated WHERE),
- ``partitionColumn/lowerBound/upperBound/numPartitions`` replacing the
  reference's PK-chunked resumable scans (tap-mysql full_table.py:92-113) —
  N parallel range scans instead of one cursor,
- ``fetchsize`` replacing SSCursor/itersize chunked fetches,
- replica reads = a different ``url`` (config, not code).

No database is available in this environment, so this module is exercised via
plan construction only; the option-building logic is pure and unit-testable.
Type-safe cast decoration (hex for binary, GeoJSON for spatial, zero-date
NULLing — fastsync/commons/tap_mysql.py:350-390) is emitted as a source
subquery so the warehouse-agnostic engine sees clean types.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def sql_literal(value: Any) -> str:
    """Render a bookmark value as a safe SQL literal. Bookmarks derive from
    source data (max replication key), so embedded quotes must be escaped —
    otherwise a crafted value breaks the query / reaches the source as SQL."""
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, bool):  # before int: bool is an int subclass
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    return "'" + str(value).replace("'", "''") + "'"


@dataclass
class JdbcSource:
    url: str  # jdbc:postgresql://replica:5432/db etc.
    table: str
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    fetchsize: int = 50_000  # reference export_batch_rows default
    partition_column: str | None = None
    num_partitions: int = 8
    options: dict[str, str] = field(default_factory=dict)

    # ------------------------------------------------------------- helpers
    def safe_select(
        self,
        columns: list[tuple[str, str]] | None = None,
        where: str | None = None,
    ) -> str:
        """Build the type-safe export subquery (dbtable-compatible).

        ``columns`` is (name, decorated_expr) pairs, e.g.
        ``("payload", "hex(payload)")`` for MySQL blobs or
        ``("geom", "ST_AsGeoJSON(geom)")`` — the reference's safe casts.
        """
        if columns:
            select = ", ".join(
                name if expr is None or expr == name else f"{expr} AS {name}"
                for name, expr in columns
            )
        else:
            select = "*"
        q = f"SELECT {select} FROM {self.table}"
        if where:
            q += f" WHERE {where}"
        return f"({q}) AS src"

    def reader_options(
        self,
        bounds: tuple[Any, Any] | None = None,
        dbtable: str | None = None,
    ) -> dict[str, str]:
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": dbtable or self.table,
            "fetchsize": str(self.fetchsize),
            **self.options,
        }
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        if self.partition_column and bounds is not None:
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(bounds[0]),
                upperBound=str(bounds[1]),
                numPartitions=str(self.num_partitions),
            )
        return opts

    # --------------------------------------------------------------- reads
    def read(
        self,
        spark: SparkSession,
        bounds: tuple[Any, Any] | None = None,
        columns: list[tuple[str, str]] | None = None,
        where: str | None = None,
    ) -> DataFrame:
        """Full-table (optionally partitioned + decorated) read."""
        dbtable = self.safe_select(columns, where) if (columns or where) else None
        return spark.read.format("jdbc").options(
            **self.reader_options(bounds, dbtable)
        ).load()

    def read_incremental(
        self,
        spark: SparkSession,
        replication_key: str,
        bookmark: Any | None,
        bounds: tuple[Any, Any] | None = None,
    ) -> DataFrame:
        """INCREMENTAL: ``key >= bookmark`` pushed into the source WHERE
        (reference re-reads the boundary row; merge by PK makes it
        idempotent)."""
        where = None
        if bookmark is not None:
            where = f"{replication_key} >= {sql_literal(bookmark)}"
        return self.read(spark, bounds=bounds, where=where)
