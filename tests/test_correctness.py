"""Every registered query must match its DuckDB oracle exactly (the local
twin of the driver's t2 gate). Runs at sf0.001 for speed; set
PWS_TEST_SF_DIR to sf0.01 to reproduce the driver run."""

from __future__ import annotations

import pytest

from pipelinewise_spark.queries import ORACLES, QUERIES
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, name, QUERIES[name], ORACLES[name], sf_dir)


def test_all_queries_have_entries():
    assert QUERIES, "no queries registered"
    missing = sorted(set(ORACLES) - set(QUERIES))
    assert not missing, f"oracles without queries: {missing}"
