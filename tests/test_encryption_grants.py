"""Client-side staged-file encryption + post-load grant hooks.

Reference parity: fastsync/commons/target_snowflake.py:109-152 (AES
envelope encryption of staged files), target_snowflake/db_sync.py:265-284,
609-637 (grantee precedence + grant statements).
"""

from __future__ import annotations

import os
import secrets

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.operators.encryption import (
    read_encrypted_staged,
    rotate_master_key,
    write_encrypted_staged,
)
from pipelinewise_spark.operators.grants import (
    apply_grants,
    grant_statements,
    read_acl,
    resolve_grantees,
)

SCHEMA = "o_orderkey long, o_orderstatus string, o_totalprice double"


@pytest.fixture()
def staged(spark, tmp_path):
    df = spark.range(200).select(
        F.col("id").alias("o_orderkey"),
        F.when(F.col("id") % 2 == 0, "O").otherwise("F").alias(
            "o_orderstatus"
        ),
        (F.col("id") * 1.5).alias("o_totalprice"),
    )
    return df, str(tmp_path / "staged")


def test_encrypt_roundtrip(spark, staged):
    df, path = staged
    master = secrets.token_bytes(32)
    write_encrypted_staged(df, path, master)
    back = read_encrypted_staged(spark, path, master, SCHEMA)
    assert sorted(r.o_orderkey for r in back.collect()) == list(range(200))
    assert back.filter(
        (F.col("o_orderkey") == 3) & (F.col("o_orderstatus") == "F")
    ).count() == 1


def test_ciphertext_is_not_plaintext(spark, staged):
    df, path = staged
    write_encrypted_staged(df, path, secrets.token_bytes(16))
    blobs = [
        open(os.path.join(path, f), "rb").read()
        for f in os.listdir(path)
        if f.startswith("part-")
    ]
    assert blobs
    joined = b"".join(blobs)
    assert b"o_orderkey" not in joined  # field names never in the clear
    assert b'"O"' not in joined


def test_wrong_master_key_fails_before_data_read(spark, staged):
    df, path = staged
    write_encrypted_staged(df, path, secrets.token_bytes(32))
    with pytest.raises(Exception):
        read_encrypted_staged(
            spark, path, secrets.token_bytes(32), SCHEMA
        ).collect()


def test_rotate_master_key_keeps_data_files(spark, staged):
    df, path = staged
    old, new = secrets.token_bytes(32), secrets.token_bytes(32)
    write_encrypted_staged(df, path, old)
    before = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.startswith("part-")
    }
    rotate_master_key(spark, path, old, new)
    after = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.startswith("part-")
    }
    assert before == after  # ciphertext untouched: envelope property
    back = read_encrypted_staged(spark, path, new, SCHEMA)
    assert back.count() == 200


def test_grantee_precedence_matches_reference():
    cfg = {
        "default_target_schema_select_permissions": ["analyst"],
        "schema_mapping": {
            "tap_pg": {"target_schema_select_permissions": ["etl", "bi"]}
        },
    }
    assert resolve_grantees(cfg) == ["analyst"]
    assert resolve_grantees(cfg, "tap_pg") == ["etl", "bi"]
    # single-role string form and absent key
    assert resolve_grantees(
        {"default_target_schema_select_permissions": "r1"}
    ) == ["r1"]
    assert resolve_grantees({}) == []


def test_apply_grants_persists_acl_and_executes(tmp_path):
    executed: list[str] = []
    stmts = apply_grants(
        str(tmp_path),
        "analytics",
        "orders",
        {"default_target_schema_select_permissions": ["analyst"]},
        execute=executed.append,
    )
    assert stmts == grant_statements("analytics", "orders", ["analyst"])
    assert executed == stmts
    assert any("GRANT USAGE ON SCHEMA" in s for s in stmts)
    assert any("GRANT SELECT ON" in s for s in stmts)
    acl = read_acl(str(tmp_path))
    assert acl["select"] == ["analyst"]
    # idempotent re-run (the reference re-grants after every load)
    stmts2 = apply_grants(
        str(tmp_path),
        "analytics",
        "orders",
        {"default_target_schema_select_permissions": ["analyst"]},
    )
    assert stmts2 == stmts
    assert read_acl(str(tmp_path)) == acl


def test_apply_grants_noop_without_config(tmp_path):
    assert apply_grants(str(tmp_path), "s", "t", {}) == []
    assert read_acl(str(tmp_path)) is None
