"""Focused tests for partitioning.state_sized_shuffle (r13 optimization).

The helper pins ``spark.sql.shuffle.partitions`` around a stateful
streaming ``start()`` so state-store count tracks state volume, not core
count, and restores the previous value afterwards (including on error).
"""

import os

import pytest

from pipelinewise_spark.partitioning import (
    _STATE_STORE_BYTES,
    dir_bytes,
    state_sized_shuffle,
)


def test_width_floor_small_state(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with state_sized_shuffle(spark, source_bytes=1024) as width:
        floor = min(8, spark.sparkContext.defaultParallelism)
        assert width == floor
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(width)
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_width_scales_with_state(spark):
    big = 100 * _STATE_STORE_BYTES
    with state_sized_shuffle(spark, source_bytes=big) as width:
        assert width == 100  # 1 store per ~64 MB of state


def test_env_override_wins(spark, monkeypatch):
    monkeypatch.setenv("PWS_STREAM_STATE_PARTITIONS", "3")
    with state_sized_shuffle(spark, source_bytes=10**12) as width:
        assert width == 3


def test_restores_on_error(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with state_sized_shuffle(spark, source_bytes=None):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_dir_bytes(tmp_path):
    (tmp_path / "a").write_bytes(b"x" * 100)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b").write_bytes(b"y" * 50)
    assert dir_bytes(str(tmp_path)) == 150
    assert dir_bytes(str(tmp_path / "missing")) == 0
