"""Local twin of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then compares
row count, column names, and (order-insensitively) every value — exact
equality, which is stricter than a hash. Used by tests so a CORRECTNESS_r{N}
mismatch never surprises us.
"""

from __future__ import annotations

import math
import os
from datetime import datetime
from decimal import Decimal

import duckdb
from pyspark.sql import types as T

# Spark integral types whose pandas rendering must stay integer-kind on the
# oracle side too (driver canonicalization parity, see compare()).
_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        # NaN equality; -0.0 == 0.0
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return repr(row)


def compare(spark, name: str, query_fn, oracle: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]

    con = duckdb_connection(sf_dir)
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    # align column order by name (driver sorts columns by name before hashing)
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    srows = sorted((_key([r[i] for i in sidx]) for r in srows))
    orows = sorted((_key([r[i] for i in oidx]) for r in orows))
    assert len(srows) == len(orows), (
        f"{name}: row count mismatch spark={len(srows)} oracle={len(orows)}"
    )
    mism = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mism, f"{name}: {len(mism)} value mismatches; first: {mism[0]}"

    # Driver-canonicalization parity: the driver compares via pandas, not
    # fetchall(). DuckDB returns SUM(BIGINT) as HUGEINT, which pandas renders
    # as float64 while Spark's side stays int64 — the value hash then
    # diverges even when every value is exactly equal (r6
    # `embedding_mean_pool_by_label` red row). fetchall() hides this
    # (HUGEINT -> Python int), so re-run the oracle through the .df() path
    # and require integer-kind dtypes wherever Spark returns an integral
    # column. Columns with NULLs are exempt: nulls force float64 on BOTH
    # sides, so the driver stays consistent there.
    odf_pd = duckdb_connection(sf_dir).execute(oracle).df()
    for f in sdf.schema.fields:
        if isinstance(f.dataType, _INT_TYPES):
            col = odf_pd[f.name]
            if col.isna().any():
                continue
            assert col.dtype.kind in "iu", (
                f"{name}: oracle column {f.name!r} reaches pandas as "
                f"{col.dtype} while Spark returns {f.dataType.simpleString()}"
                f" — the driver's pandas canonicalizer will hash-mismatch "
                f"even on equal values (DuckDB HUGEINT class; CAST the "
                f"aggregate to BIGINT in the oracle SQL)"
            )
