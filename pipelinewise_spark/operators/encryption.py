"""Client-side encryption of staged load files.

Reference: ``fastsync/commons/target_snowflake.py:109-152`` — when
``client_side_encryption_master_key`` is configured, every staged CSV is
AES-encrypted *before* upload using a per-file data key, and the wrapped
key + IV travel alongside the object (``x-amz-key`` / ``x-amz-iv``
metadata) so the warehouse can unwrap with the master key. The staging
bucket operator never holds plaintext.

Spark-native shape (same envelope contract, executed distributed):

- the staged payload is encrypted executor-side with the JVM's built-in
  ``aes_encrypt`` (AES-GCM: random 12-byte IV per value, auth tag
  appended — IV management is per-record and automatic, the analog of the
  reference's per-file IV);
- one random DATA KEY per staged write (the per-file key analog), wrapped
  with the MASTER key and published in a ``_encryption_metadata.json``
  sidecar next to the staged files (the object-metadata analog; works on
  any filesystem/object store via MetaFS);
- the master key itself never reaches a data file, and rotating it only
  re-wraps sidecars — staged ciphertext is untouched (envelope property).

No Python crypto dependency: both the bulk path and the key wrap run on
the JVM (``aes_encrypt`` / ``aes_decrypt``), so encryption throughput
scales with executors and 100 TB of staged files encrypt in the same job
that writes them.

Key-material leak surface. ``aes_encrypt(payload, lit(key))`` embeds the
key bytes as a binary literal in the logical/physical plan, which Spark
renders (hex) in ``explain`` output, the UI SQL tab, and event logs — the
reference never logs ``client_side_encryption_master_key``. Every entry
point here therefore installs ``spark.sql.redaction.string.regex``
matching any >=16-byte hex literal (``0x[0-9A-F]{32,}``) before building a
plan that carries a key: Spark applies that regex to every plan string it
externalizes (explain, SQL-tab descriptions, event-log
``SparkListenerSQLExecutionStart``), so key literals surface as
``*(redacted)``. The pattern is generic on purpose — a key-specific regex
would itself republish the key through the UI environment page. Residual
surface (documented): anything that bypasses plan *strings* (e.g. a
heap dump, or ``df.queryExecution`` object access from the driver) can
still reach the literal; for jobs where that matters, disable event-log
capture (``spark.eventLog.enabled=false``) and UI (``spark.ui.enabled=
false``), or isolate staging encryption into a separate short-lived
session.
"""

from __future__ import annotations

import json
import secrets

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pipelinewise_spark.operators.fsio import MetaFS

_SIDECAR = "_encryption_metadata.json"
_MODE = "GCM"
# any binary literal of >=16 bytes rendered in a plan string — covers
# AES-128/192/256 key material without the regex itself naming a key
_KEY_LITERAL_REGEX = "0x[0-9A-Fa-f]{32,}"


def _ensure_plan_redaction(spark: SparkSession) -> None:
    """Idempotently extend ``spark.sql.redaction.string.regex`` so key
    literals never render in explain/UI/event-log plan strings."""
    try:
        cur = spark.conf.get("spark.sql.redaction.string.regex")
    except Exception:
        cur = None
    if cur and _KEY_LITERAL_REGEX in cur:
        return
    pattern = f"{cur}|{_KEY_LITERAL_REGEX}" if cur else _KEY_LITERAL_REGEX
    spark.conf.set("spark.sql.redaction.string.regex", pattern)


def _wrap_key(spark: SparkSession, data_key: bytes, master_key: bytes) -> str:
    """AES-GCM-wrap the data key with the master key (JVM-side, one row);
    hex framing (Spark's ``base64`` MIME-chunks past 76 chars)."""
    _ensure_plan_redaction(spark)
    row = spark.range(1).select(
        F.hex(
            F.aes_encrypt(
                F.lit(data_key), F.lit(master_key), F.lit(_MODE)
            )
        ).alias("wrapped")
    )
    return row.head()[0]


def _unwrap_key(spark: SparkSession, wrapped_hex: str, master_key: bytes) -> bytes:
    _ensure_plan_redaction(spark)
    row = spark.range(1).select(
        F.aes_decrypt(
            F.unhex(F.lit(wrapped_hex)), F.lit(master_key), F.lit(_MODE)
        ).alias("key")
    )
    return bytes(row.head()[0])


def write_encrypted_staged(
    df: DataFrame,
    path: str,
    master_key: bytes,
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Stage ``df`` under ``path`` as client-side-encrypted records: each
    record serializes to JSON, encrypts with the run's data key (AES-GCM,
    per-record IV), and lands as one binary ``ciphertext`` cell in parquet
    (binary framing — Spark's ``base64`` MIME-chunks long values, so text
    framing would corrupt records). The wrapped data key is published to
    the ``_encryption_metadata.json`` sidecar AFTER the data write
    succeeds (files without their sidecar are unreadable garbage, never
    half-published secrets)."""
    if len(master_key) not in (16, 24, 32):
        raise ValueError("master_key must be 16/24/32 bytes")
    spark = df.sparkSession
    _ensure_plan_redaction(spark)
    data_key = secrets.token_bytes(32)
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    ciphertext = F.aes_encrypt(
        payload.cast("binary"), F.lit(data_key), F.lit(_MODE)
    )
    (
        df.select(ciphertext.alias("ciphertext"))
        .write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )
    meta = {
        "algorithm": f"AES-{_MODE}",
        "key_length": len(data_key),
        "wrapped_data_key": _wrap_key(spark, data_key, master_key),
        "format": "parquet+binary",
    }
    MetaFS(path).write_text(json.dumps(meta, indent=1), _SIDECAR, atomic=True)


def read_encrypted_staged(
    spark: SparkSession,
    path: str,
    master_key: bytes,
    schema: StructType | str,
) -> DataFrame:
    """Decrypt a staged directory written by ``write_encrypted_staged``:
    unwrap the data key from the sidecar (driver-side, one row), then
    decrypt + parse records executor-side. A wrong master key fails at the
    unwrap — before any data file is read."""
    _ensure_plan_redaction(spark)
    meta = json.loads(MetaFS(path).read_text(_SIDECAR))
    data_key = _unwrap_key(spark, meta["wrapped_data_key"], master_key)
    plaintext = F.aes_decrypt(
        F.col("ciphertext"), F.lit(data_key), F.lit(_MODE)
    ).cast("string")
    return (
        spark.read.parquet(path)
        .select(F.from_json(plaintext, schema).alias("r"))
        .select("r.*")
    )


def rotate_master_key(
    spark: SparkSession, path: str, old_master: bytes, new_master: bytes
) -> None:
    """Master-key rotation = re-wrap the sidecar only; staged ciphertext
    (arbitrarily large) is never rewritten — the point of envelope
    encryption."""
    fs = MetaFS(path)
    meta = json.loads(fs.read_text(_SIDECAR))
    data_key = _unwrap_key(spark, meta["wrapped_data_key"], old_master)
    meta["wrapped_data_key"] = _wrap_key(spark, data_key, new_master)
    fs.write_text(json.dumps(meta, indent=1), _SIDECAR, atomic=True)
