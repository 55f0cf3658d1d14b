#!/usr/bin/env python
"""Capture .explain("formatted") output for registered queries (dev-only).

Writes plans/<tag>/<query>_<suffix>.txt for each named query — the
committed evidence for optimization-round plan claims.

Usage: python scripts/capture_plans.py <tag> <suffix> <q1,q2,...> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark.caching import release_caches  # noqa: E402
from pipelinewise_spark.queries import QUERIES  # noqa: E402
from pipelinewise_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("pws-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
        release_caches(spark)


if __name__ == "__main__":
    main()
