"""Pins for domain-aware curation caps (functions/curation.py:
domain_cap_mix): the frequency cap binds flood domains to their ppm
share of the INPUT corpus, the quality quota keeps each domain's best
slice, the ranking is deterministic, and both knobs compose on one
rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.functions.curation import domain_cap_mix


def _corpus(spark):
    # flood domain: 60 docs; two organic domains: 20 each (N=100)
    rows = [(i, "flood", i % 7) for i in range(60)]
    rows += [(100 + i, "a", i) for i in range(20)]
    rows += [(200 + i, "b", i) for i in range(20)]
    return spark.createDataFrame(rows, "id long, dom string, q long")


def test_frequency_cap_binds_flood_domain(spark):
    out = domain_cap_mix(
        _corpus(spark), "dom", "id", max_domain_ppm=250_000,
        quality_col="q",
    )
    by_dom = {
        r["dom"]: r["n"]
        for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    # cap = floor-equivalent rank bound: rank*1e6 <= 100*250000 -> rank<=25
    assert by_dom == {"flood": 25, "a": 20, "b": 20}


def test_quality_quota_keeps_best_slice_per_domain(spark):
    out = domain_cap_mix(
        _corpus(spark), "dom", "id", max_domain_ppm=1_000_000,
        quality_col="q", quality_quota_ppm=500_000,
    )
    a = out.filter(F.col("dom") == "a")
    # quota: rank*1e6 <= 20*500000 -> rank <= 10, and ranked q-desc
    assert a.count() == 10
    assert a.agg(F.min("q")).collect()[0][0] == 10  # top half by quality


def test_cap_and_quota_compose_on_one_rank(spark):
    out = domain_cap_mix(
        _corpus(spark), "dom", "id", max_domain_ppm=150_000,
        quality_col="q", quality_quota_ppm=500_000,
    )
    by_dom = {
        r["dom"]: r["n"]
        for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    # flood: min(cap 15, quota 30) = 15; organic: min(cap 15, quota 10) = 10
    assert by_dom == {"flood": 15, "a": 10, "b": 10}


def test_md5_order_without_quality_is_deterministic(spark):
    df = _corpus(spark)
    one = domain_cap_mix(df, "dom", "id", max_domain_ppm=100_000)
    two = domain_cap_mix(df, "dom", "id", max_domain_ppm=100_000)
    assert sorted(r["id"] for r in one.collect()) == sorted(
        r["id"] for r in two.collect()
    )
    # rank bound: rank*1e6 <= 100*100000 -> rank <= 10 per domain
    assert one.count() == 30


def test_quota_without_quality_raises(spark):
    with pytest.raises(ValueError):
        domain_cap_mix(
            _corpus(spark), "dom", "id", 100_000, quality_quota_ppm=1
        )


def test_domain_rank_column_is_exposed_and_dense(spark):
    out = domain_cap_mix(
        _corpus(spark), "dom", "id", max_domain_ppm=100_000,
        quality_col="q",
    )
    ranks = sorted(
        r["domain_rank"]
        for r in out.filter(F.col("dom") == "flood").collect()
    )
    assert ranks == list(range(1, 11))
