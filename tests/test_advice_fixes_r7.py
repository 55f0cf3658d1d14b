"""Regression tests for the round-6 ADVICE items fixed in round 7."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ADVICE #1
def test_group_prefix_sum_negative_values_match_window(spark):
    """Fragment totals were max('__run') — correct only for nonnegative
    values. The documented contract is a general per-group running sum, so
    mixed-sign inputs must match the window reference exactly."""
    from pipelinewise_spark.functions.curation import group_prefix_sum

    df = spark.range(400).selectExpr(
        "id % 4 AS g",
        "id AS ord",
        # mixed signs, including runs that dip negative then recover
        "CAST(CASE WHEN id % 3 = 0 THEN -(id % 17) ELSE id % 11 END AS LONG) AS v",
    )
    got = {
        (r["g"], r["ord"]): r["cum"]
        for r in group_prefix_sum(
            df, ["g"], ["ord"], "v", num_partitions=8
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["g"], r["ord"]): r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_group_prefix_sum_cardinality_guard(spark):
    from pipelinewise_spark.functions.curation import group_prefix_sum

    df = spark.range(200).selectExpr("id AS g", "id AS ord", "id AS v")
    with pytest.raises(ValueError, match="max_offset_rows"):
        group_prefix_sum(
            df, ["g"], ["ord"], "v", num_partitions=4, max_offset_rows=10
        ).collect()


def test_shard_by_token_budget_unchanged_for_token_counts(spark):
    """The fragment-total change (sum of values instead of max of running
    sum) must be invisible for the operator's normal nonnegative inputs."""
    from pipelinewise_spark.functions.curation import shard_by_token_budget

    df = spark.range(500).selectExpr("id AS k", "(id % 7 + 1) AS n_tok")
    out = shard_by_token_budget(df, "k", "n_tok", budget=100,
                                num_partitions=8)
    rows = sorted(out.collect(), key=lambda r: r["k"])
    run = 0
    for r in rows:
        assert r["shard"] == run // 100
        run += r["n_tok"]


# ---------------------------------------------------------------- ADVICE #2
def test_analyze_stats_fresh_immediately_after_publish(spark, tmp_path):
    """analyze() publishes a new manifest; the stats version stamp must
    name THAT manifest, or a fresh ANALYZE reads as stale in `status`."""
    from pipelinewise_spark.operators.manifest_table import ManifestTable

    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.range(10).selectExpr("id", "id % 3 AS k"))
    t.analyze(spark)
    st = t.table_stats()
    assert st is not None
    assert st["version"] == t.current_manifest_name(), (
        "freshly analyzed stats must not read as stale"
    )
    # stats survive a data commit and DO read stale afterwards
    t.overwrite(spark.range(20).selectExpr("id", "id % 3 AS k"))
    st2 = t.table_stats()
    assert st2 is not None and st2["version"] != t.current_manifest_name()


# ---------------------------------------------------------------- ADVICE #3
def test_export_manifest_through_metafs_wrapped_uri(spark, tmp_path):
    """Manifest IO must go through the pyarrow.fs seam: exercise the
    listing/stat/write path and the roundtrip reader."""
    from pipelinewise_spark.operators.export import (
        export_split_gzip_csv,
        read_export_manifest,
    )

    dest = str(tmp_path / "exp")
    df = spark.range(1000).selectExpr("id", "concat('row', id) AS s")
    manifest = export_split_gzip_csv(df, dest, chunk_size_mb=1)
    back = read_export_manifest(dest)
    assert back == manifest
    assert back["rows"] == 1000
    assert back["files"] and all(f["bytes"] > 0 for f in back["files"])


def test_lsh_persisted_index_sidecar_via_metafs(spark, tmp_path):
    from pipelinewise_spark.functions.dedup import (
        build_lsh_index,
        minhash_lsh_pairs_against_index,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "an entirely different document about spark engines")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    build_lsh_index(corpus, path, "doc_id", "text")
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs_against_index(spark, path, batch)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 10) in got


# ---------------------------------------------------------------- ADVICE #4
def test_lsh_index_releases_previous_batch_cache(spark):
    """A daemon looping inside one `with lsh_index(...)` block must hold at
    most ONE batch shingle cache at a time."""
    from pipelinewise_spark.caching import live_cache_count as registered_count
    from pipelinewise_spark.functions.dedup import lsh_index

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} with shared words here") for i in range(5)],
        "doc_id long, text string",
    )
    with lsh_index(corpus, "doc_id", "text") as idx:
        baseline = None
        for b in range(4):
            batch = spark.createDataFrame(
                [(100 + b, f"batch {b} doc with shared words here")],
                "doc_id long, text string",
            )
            idx.pairs_against(batch).count()
            n = registered_count()
            if baseline is None:
                baseline = n  # corpus + first batch
            else:
                assert n <= baseline, (
                    f"batch caches accumulate: {n} registered after "
                    f"batch {b}, baseline {baseline}"
                )


# ------------------------------------------------- r7 task #8: index verbs
def test_lsh_index_extend_compact_vacuum_preserves_pairs(spark, tmp_path):
    """extend/compact/vacuum must be candidate-set-preserving, reduce
    fragment counts, and remove superseded dirs."""
    import os

    from pipelinewise_spark.functions.dedup import (
        build_lsh_index,
        compact_lsh_index,
        extend_lsh_index,
        minhash_lsh_pairs_against,
        minhash_lsh_pairs_against_index,
        vacuum_lsh_index,
    )

    docs = [
        (i, f"shared boilerplate words number {i % 3} appear here often")
        for i in range(12)
    ]
    corpus0 = spark.createDataFrame(docs[:8], "doc_id long, text string")
    ext = spark.createDataFrame(docs[8:], "doc_id long, text string")
    probe = spark.createDataFrame(
        [(100, "shared boilerplate words number 1 appear here often")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    build_lsh_index(corpus0, path, "doc_id", "text")
    extend_lsh_index(ext, path)

    full = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_against(
            full, probe, "doc_id", "text"
        ).collect()
    }
    got_pre = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_against_index(spark, path, probe).collect()
    }
    assert got_pre == want and want, "extended index must cover both loads"

    def _n_fragments(sub):
        d = os.path.join(path, sub)
        return sum(
            f.endswith(".parquet")
            for _, _, fs in os.walk(d)
            for f in fs
        )

    import json as _j
    pre = _j.loads(
        open(os.path.join(path, "_lsh_index.json")).read()
    )
    frags_before = _n_fragments(pre["bands_dir"])
    meta = compact_lsh_index(spark, path)
    removed = vacuum_lsh_index(path)
    # vacuum removes exactly the superseded (pre-compaction) dirs
    assert {pre["shingles_dir"], pre["bands_dir"]} <= set(removed)
    assert not os.path.exists(os.path.join(path, pre["bands_dir"]))
    assert _n_fragments(meta["bands_dir"]) <= frags_before

    got_post = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_against_index(spark, path, probe).collect()
    }
    assert got_post == want, "compaction/vacuum changed the candidate set"


# -------------------------------------------------- persisted IVF index
def test_ivf_index_probe_prunes_partitions_and_matches_inplan(
    spark, tmp_path
):
    """The persisted-index probe must (a) scan only the probed inverted
    lists (parquet PartitionFilters prune the rest) and (b) return the
    same neighbors as the in-plan ivf_topk under identical centroids."""
    import pipelinewise_spark.functions.similarity as S

    emb = spark.range(200).selectExpr(
        "id AS vec_id",
        # deterministic 64-dim vectors (id+1 so no all-zero vector forms:
        # cosine of a zero vector is undefined and ANSI mode would throw)
        "transform(sequence(1, 64), j -> CAST(sin((id + 1) * j) AS FLOAT)) "
        "AS embedding",
    )
    path = str(tmp_path / "ivf")
    S.build_ivf_index(emb, path, "vec_id", "embedding", num_centroids=8)
    queries = emb.filter("vec_id < 5")
    got = S.ivf_topk_against_index(
        spark, path, queries, "embedding", k=3, n_probe=2
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the probed-list filter must reach the scan as a partition filter
    assert "centroid_id" in plan.split("PartitionFilters")[1][:200]

    inplan = S.ivf_topk(
        emb, queries, "vec_id", "embedding", k=3, num_centroids=8, n_probe=2
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, inplan.collect())
    )


def test_ivf_index_extend_assigns_to_existing_lists(spark, tmp_path):
    import os

    import pipelinewise_spark.functions.similarity as S

    emb = spark.range(120).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> CAST(cos(id + j) AS FLOAT)) "
        "AS embedding",
    )
    path = str(tmp_path / "ivf")
    S.build_ivf_index(
        emb.filter("vec_id < 100"), path, "vec_id", "embedding",
        num_centroids=4,
    )
    dirs_before = {
        d for d in os.listdir(os.path.join(path, "lists-0000"))
        if d.startswith("centroid_id=")
    }
    S.extend_ivf_index(emb.filter("vec_id >= 100"), path, "embedding")
    dirs_after = {
        d for d in os.listdir(os.path.join(path, "lists-0000"))
        if d.startswith("centroid_id=")
    }
    assert dirs_after <= dirs_before | dirs_after
    assert dirs_after == dirs_before or dirs_after.issuperset(dirs_before)
    # every vector, old and new, is findable
    import pyspark.sql.functions as F

    back = spark.read.parquet(os.path.join(path, "lists-0000"))
    assert back.count() == 120
    assert back.select("vec_id").distinct().count() == 120


def test_cli_index_verbs_roundtrip(spark, tmp_path, capsys):
    """`index build/extend/compact/vacuum` drive the standing-index verbs
    end-to-end from the CLI."""
    import json

    from pipelinewise_spark.__main__ import main as cli_main
    from pipelinewise_spark.functions.dedup import (
        minhash_lsh_pairs_against_index,
    )

    corpus = spark.createDataFrame(
        [(i, f"common phrase repeated across documents {i % 2}")
         for i in range(6)],
        "doc_id long, text string",
    )
    src0, src1 = str(tmp_path / "c0"), str(tmp_path / "c1")
    corpus.filter("doc_id < 4").write.parquet(src0)
    corpus.filter("doc_id >= 4").write.parquet(src1)
    idx = str(tmp_path / "idx")

    assert cli_main(["index", "build", idx, "--source", src0]) == 0
    assert cli_main(["index", "extend", idx, "--source", src1]) == 0
    assert cli_main(["index", "compact", idx]) == 0
    assert cli_main(["index", "vacuum", idx]) == 0
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert [o["action"] for o in lines] == [
        "build", "extend", "compact", "vacuum"
    ]
    assert lines[2]["compactions"] == 1
    # vacuum removes exactly the pre-compaction (version-0) dirs
    assert set(lines[3]["removed"]) == {"shingles-0000", "bands-0000"}

    probe = spark.createDataFrame(
        [(99, "common phrase repeated across documents 0")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_against_index(spark, idx, probe).collect()
    }
    assert got, "compacted+vacuumed index must still answer probes"
    assert cli_main(["index", "build", idx]) == 2  # --source required
