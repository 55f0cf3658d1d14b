#!/usr/bin/env python
"""R-scale measurement for the GUARDED near-dup pair generators — the
measurement SCALE.md r10 had to omit: on the replica-degenerate scaled
corpus the UNGUARDED answer is output-quadratic by construction (~26M
pairs at R=100), so any timing measures the box's shuffle disk, not the
operator. With the bounded-emit guard (functions/dedup.py:
bounded_bucket_candidates) dense buckets emit spanning paths and the
answer returns to corpus-linear — the production configuration for a
replica-dense corpus, now measurable.

Times signlsh_near_dup_pairs(max_pairs_per_bucket=64) over embeddings
and minhash_lsh_pairs(max_pairs_per_bucket=64) over documents at sf0.1
and at $PWS_SCALED_DIR (default /tmp/pws_sf100), with the scale_sweep
protocol: noop write, min-of-3 with early exit, cache release between
passes. Prints per-query ratios + output row counts.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python scripts/scale_bounded_pairs.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pipelinewise_spark.caching import release_caches  # noqa: E402
from pipelinewise_spark.functions.dedup import minhash_lsh_pairs  # noqa: E402
from pipelinewise_spark.functions.similarity import (  # noqa: E402
    signlsh_near_dup_pairs,
)
from pipelinewise_spark.session import get_spark  # noqa: E402
from pipelinewise_spark.sources.files import read_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
BIG = os.environ.get("PWS_SCALED_DIR", "/tmp/pws_sf100")
CAP = 64


def plans(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    docs = read_table(spark, sf_dir, "documents")
    return {
        "signlsh_bounded_pairs": signlsh_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.4,
            max_pairs_per_bucket=CAP,
        ),
        "minhash_bounded_pairs": minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.3,
            max_pairs_per_bucket=CAP,
        ),
    }


def run(spark, df) -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if best is not None and dt >= 0.9 * best:
            best = min(best, dt)
            break
        best = dt if best is None else min(best, dt)
        release_caches(spark)
    release_caches(spark)
    return best


def main() -> None:
    spark = get_spark("pws-scale-bounded")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in ("signlsh_bounded_pairs", "minhash_bounded_pairs"):
        t_small = run(spark, plans(spark, SF01)[name])
        n_small = plans(spark, SF01)[name].count()
        release_caches(spark)
        t_big = run(spark, plans(spark, BIG)[name])
        n_big = plans(spark, BIG)[name].count()
        release_caches(spark)
        out[name] = {
            "sf0.1_s": round(t_small, 2), "big_s": round(t_big, 2),
            "ratio": round(t_big / t_small, 2),
            "pairs_small": n_small, "pairs_big": n_big,
        }
        print(name, out[name], flush=True)
    with open("/tmp/scale_bounded.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
