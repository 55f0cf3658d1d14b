"""CLI — `python -m pipelinewise_spark <command>`.

The reference's operational surface (cli/__init__.py commands) reduced to the
engine's three verbs:

    run        run every stream of a YAML pipeline (sources = parquet dirs)
    profile    per-column statistics of a parquet table
    state      print the pipeline's bookmark state
    discover   emit a Singer-style catalog (streams + JSON Schemas)
    optimize   ManifestTable maintenance: compact / Z-order / Bloom / vacuum

Example:
    python -m pipelinewise_spark run --config pipeline.yml \
        --source-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cmd_run(args: argparse.Namespace) -> int:
    from pipelinewise_spark.plans.yaml_config import compile_yaml_file
    from pipelinewise_spark.runner import PipelineRunner
    from pipelinewise_spark.session import get_spark

    spec = compile_yaml_file(args.config)
    spark = get_spark(f"pipelinewise-{spec.pipeline_id}")
    spark.sparkContext.setLogLevel("ERROR")
    runner = PipelineRunner(spark, spec)
    sources = {}
    for s in spec.streams:
        # tap_stream_id is "<schema>-<table>"; source file = <table>.parquet
        table = s.tap_stream_id.split("-", 1)[-1]
        p = os.path.join(args.source_dir, f"{table}.parquet")
        if os.path.exists(p):
            sources[s.tap_stream_id] = spark.read.parquet(p)
    results = runner.run(sources)
    for r in results:
        print(
            json.dumps(
                {
                    "stream": r.tap_stream_id,
                    "method": r.method,
                    "rows_loaded": r.rows_loaded,
                    "bookmark": r.bookmark,
                },
                default=str,
            )
        )
    return 0


def _cmd_profile(args: argparse.Namespace) -> int:
    from pipelinewise_spark.operators.profile import profile
    from pipelinewise_spark.session import get_spark

    spark = get_spark("pipelinewise-profile")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.path)
    for row in profile(df).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def _cmd_state(args: argparse.Namespace) -> int:
    from pipelinewise_spark.plans.state import BookmarkStore

    print(json.dumps(BookmarkStore(args.path).as_dict(), indent=2))
    return 0


def _cmd_discover(args: argparse.Namespace) -> int:
    """Singer-style catalog discovery over a directory of parquet tables —
    the `pipelinewise discover_tap` surface: every stream with its JSON
    Schema (via the §1.3 type bridge) and selection metadata."""
    from pipelinewise_spark.schema.jsonschema import struct_to_json_schema
    from pipelinewise_spark.session import get_spark
    from pipelinewise_spark.sources.files import glob_tables

    spark = get_spark("pipelinewise-discover")
    spark.sparkContext.setLogLevel("ERROR")
    streams = []
    for table in glob_tables(args.source_dir):
        df = spark.read.parquet(os.path.join(args.source_dir, f"{table}.parquet"))
        streams.append(
            {
                "tap_stream_id": f"{args.schema_name}-{table}",
                "table_name": table,
                "schema": struct_to_json_schema(df.schema),
                "metadata": [
                    {
                        "breadcrumb": [],
                        "metadata": {
                            "selected": True,
                            "schema-name": args.schema_name,
                            "row-count": None,
                        },
                    }
                ],
            }
        )
    print(json.dumps({"streams": streams}, indent=2, sort_keys=True))
    return 0


def _cmd_optimize(args: argparse.Namespace) -> int:
    """Lakehouse table maintenance in one pass — the OPTIMIZE verb: compact
    fragmented partitions, optionally re-cluster along a Z-order, attach
    Bloom indexes, and vacuum unreferenced files."""
    from pipelinewise_spark.operators.manifest_table import ManifestTable
    from pipelinewise_spark.operators.zorder import cluster_by
    from pipelinewise_spark.session import get_spark

    spark = get_spark("pipelinewise-optimize")
    spark.sparkContext.setLogLevel("ERROR")
    t = ManifestTable(args.table)
    report: dict = {"table": args.table}
    if args.zorder:
        cols = [c.strip() for c in args.zorder.split(",") if c.strip()]
        df = cluster_by(t.read(spark), cols, num_files=args.target_files)
        # a fresh CLI handle has partition_by=[] — pass None so overwrite()
        # falls back to the manifest's LIVE partition spec instead of
        # silently rewriting a partitioned table unpartitioned
        t.overwrite(df, t.partition_by or None)
        report["zorder"] = cols
    else:
        report["compacted_partitions"] = t.compact(spark)
    if args.bloom:
        cols = [c.strip() for c in args.bloom.split(",") if c.strip()]
        t.add_bloom_filters(spark, cols)
        report["bloom"] = cols
    if args.vacuum:
        t.vacuum(keep_manifests=args.keep_manifests)
        report["vacuumed"] = True
    report["version"] = t.current_manifest_name()
    print(json.dumps(report))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pipelinewise_spark")
    sub = p.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="run a YAML pipeline")
    run.add_argument("--config", required=True, help="pipeline YAML")
    run.add_argument("--source-dir", required=True,
                     help="directory of <table>.parquet sources")
    run.set_defaults(fn=_cmd_run)

    prof = sub.add_parser("profile", help="profile a parquet table")
    prof.add_argument("path")
    prof.set_defaults(fn=_cmd_profile)

    st = sub.add_parser("state", help="print bookmark state")
    st.add_argument("path")
    st.set_defaults(fn=_cmd_state)

    disc = sub.add_parser(
        "discover", help="emit a Singer-style catalog for a source dir"
    )
    disc.add_argument("source_dir")
    disc.add_argument("--schema-name", default="public")
    disc.set_defaults(fn=_cmd_discover)

    opt = sub.add_parser(
        "optimize",
        help="ManifestTable maintenance: compact / zorder / bloom / vacuum",
    )
    opt.add_argument("table", help="ManifestTable root path")
    opt.add_argument("--zorder", help="comma-separated Z-order columns")
    opt.add_argument("--bloom", help="comma-separated Bloom-index columns")
    opt.add_argument("--vacuum", action="store_true")
    opt.add_argument("--keep-manifests", type=int, default=2)
    opt.add_argument("--target-files", type=int, default=None)
    opt.set_defaults(fn=_cmd_optimize)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
