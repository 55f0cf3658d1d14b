#!/usr/bin/env python
"""Targeted oracle sweep (dev-only): value-exact compare for a named
query list at a given sf dir — the per-change rehearsal loop.

Usage: python scripts/oracle_subset.py q1,q2,... [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    builder = SparkSession.builder.master("local[32]").appName(
        "oracle-subset-vanilla"
    )
    # optional extra confs ("k=v;k=v") — e.g. rehearse an engine-default
    # conf on this otherwise-vanilla session
    for kv in filter(None, os.environ.get(
        "PWS_ORACLE_EXTRA_CONF", ""
    ).split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from oracle import compare  # tests/oracle.py

    from pipelinewise_spark.caching import release_caches
    from pipelinewise_spark.queries import ORACLES, QUERIES

    failed = []
    for i, name in enumerate(names):
        t = time.time()
        try:
            release_caches(spark)
            compare(spark, name, QUERIES[name], ORACLES[name], sf_dir)
            print(f"[{i:2d}] OK   {name} ({time.time() - t:.1f}s)", flush=True)
        except Exception:
            failed.append(name)
            print(f"[{i:2d}] FAIL {name}", flush=True)
            traceback.print_exc()
    print(f"\n{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
