#!/usr/bin/env python
"""Scale-evidence sweep: time a query subset at sf0.1 and at the 10x
self-scaled copy (scripts/make_scaled_data.py), print per-query scaling
ratios. A plan whose documented shape is linear should land near 10x
(CPU-bound local[32] wall-clock; sub-10x means fixed overhead still
dominates at sf0.1, well past ~10x means a super-linear stage to audit).

Usage: python scripts/scale_sweep.py [query ...]
Defaults to the bench HEADLINE subset. Point PWS_SCALED_DIR at any
make_scaled_data.py output (R=10/30/100…); at R>=100 set
SPARK_GRAFT_DRIVER_MEM=48g — memory must scale with data, or AQE
runtime broadcasts (compressed-size threshold, deserialized-size
build) kill the run on the default 8g heap (SCALE.md, round-10 notes).
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
from pipelinewise_spark.queries import QUERIES, fixturetime  # noqa: E402
from pipelinewise_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("PWS_SCALED_DIR", "/tmp/pws_sf1")


def main() -> None:
    from bench import HEADLINE

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("pws-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> tuple[float, float]:
        """Best (total_s, engine_s) of up to 3 passes.

        engine_s subtracts the query's own fixture-build time
        (fixturetime accumulator) — several capture/stream queries
        synthesize their input NDJSON on the DRIVER inside the timed
        region, which is test scaffolding a real deployment doesn't
        pay (the tap wrote the capture). Both numbers are reported;
        engine_s picks the pass with the best fixture-subtracted time.
        """
        best = best_eng = None
        for _ in range(3):
            fixturetime.drain()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            eng = dt - fixturetime.drain()
            best_eng = eng if best_eng is None else min(best_eng, eng)
            if best is not None and dt >= 0.9 * best:
                best = min(best, dt)
                break
            best = dt if best is None else min(best, dt)
            df = None
            release_caches(spark)
        release_caches(spark)
        return best, best_eng

    out = {}
    for name in names:
        if name not in QUERIES:
            continue
        t_small, e_small = run(name, SF01)
        t_big, e_big = run(name, SF1)
        out[name] = {
            "sf0.1_s": round(t_small, 3),
            "x10_s": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
            "engine_sf0.1_s": round(e_small, 3),
            "engine_x10_s": round(e_big, 3),
            "engine_ratio": round(e_big / max(e_small, 1e-9), 2),
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s  "
            f"ratio {t_big / t_small:.2f}x  "
            f"(engine {e_small:.2f}s -> {e_big:.2f}s, "
            f"{e_big / max(e_small, 1e-9):.2f}x)", flush=True,
        )
    with open("/tmp/scale_sweep.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"n": len(out)}))


if __name__ == "__main__":
    main()
