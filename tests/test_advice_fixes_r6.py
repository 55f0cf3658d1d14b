"""Round-6 ADVICE regressions, proven on adversarial fixtures the sf
testdata doesn't contain:

- lang_percentile_filter_documents: a single-document language must get
  percentile 0 (dropped at >= 0.25), not NaN-kept; NULL-lang documents
  form their own stratum instead of vanishing through the join.
- curation_funnel_documents: NULL-text documents count in every stage's
  totals (null-safe dedup key).
- resolve_grantees: a schema present in schema_mapping WITHOUT
  target_schema_select_permissions grants NOTHING (mapping wins; no
  fallback to the global default).
- encryption: key bytes never render in explain/plan strings.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pipelinewise_spark.queries import ORACLES, QUERIES
from tests.oracle import compare

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "the quick brown fox jumps over the lazy dog again and again", "en",
     "web", 60),
    (2, "pack my box with five dozen liquor jugs for the long trip home",
     "en", "web", 62),
    (3, "how vexingly quick daft zebras jump over fences in the park", "en",
     "web", 59),
    (4, "sphinx of black quartz judge my vow said the tired old judge", "en",
     "web", 60),
    (5, "solo documento en este idioma", "es", "web", 29),  # 1-doc language
    (6, None, "en", "web", None),  # NULL text
    (7, "a document with no language tag at all floating in the corpus",
     None, "web", 61),  # NULL lang (also a 1-doc stratum)
    (8, "the quick brown fox jumps over the lazy dog again and again", "en",
     "mirror", 60),  # exact duplicate of doc 1
]


def _adversarial_sf_dir(spark, tmp_path) -> str:
    sf = str(tmp_path / "sf_adv")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(
        ADVERSARIAL_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # one parquet FILE per table name, like the driver's testdata layout
    df.toPandas().to_parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_lang_percentile_single_doc_and_null_lang(spark, tmp_path):
    sf = _adversarial_sf_dir(spark, tmp_path)
    # value-exact vs the DuckDB oracle on the adversarial corpus
    compare(
        spark,
        "lang_percentile_filter_documents",
        QUERIES["lang_percentile_filter_documents"],
        ORACLES["lang_percentile_filter_documents"],
        sf,
    )
    rows = QUERIES["lang_percentile_filter_documents"](spark, sf).collect()
    ids = {r["doc_id"] for r in rows}
    # the single-doc 'es' stratum has percent_rank 0 -> dropped, never
    # NaN-kept; same for the single NULL-lang doc
    assert 5 not in ids
    assert 7 not in ids
    # no NaN leaks into the output
    assert all(r["lang_pct"] == r["lang_pct"] for r in rows)


def test_curation_funnel_counts_null_text(spark, tmp_path):
    sf = _adversarial_sf_dir(spark, tmp_path)
    compare(
        spark,
        "curation_funnel_documents",
        QUERIES["curation_funnel_documents"],
        ORACLES["curation_funnel_documents"],
        sf,
    )
    rows = {
        r["stage"]: r
        for r in QUERIES["curation_funnel_documents"](spark, sf).collect()
    }
    # the NULL-text doc is INGESTED (8 docs), even though it passes nothing
    assert rows["ingested"]["rows_in"] == len(ADVERSARIAL_DOCS)


def test_grantees_mapping_without_permissions_grants_nothing():
    from pipelinewise_spark.operators.grants import resolve_grantees

    cfg = {
        "default_target_schema_select_permissions": ["analyst"],
        "schema_mapping": {
            "locked": {"target_schema": "tgt_locked"},  # no permissions key
            "open": {"target_schema_select_permissions": ["auditor"]},
        },
    }
    # mapping present, no permissions -> NOTHING (least privilege), never
    # the global default
    assert resolve_grantees(cfg, "locked") == []
    # mapping present with permissions -> the mapping's roles
    assert resolve_grantees(cfg, "open") == ["auditor"]
    # schema absent from the mapping -> the global default
    assert resolve_grantees(cfg, "elsewhere") == ["analyst"]
    # no config at all -> no grants
    assert resolve_grantees({}, "any") == []


def test_encryption_key_redacted_in_plan_strings(spark):
    import contextlib
    import io
    import secrets

    from pipelinewise_spark.operators.encryption import (
        _ensure_plan_redaction,
    )

    master = secrets.token_bytes(32)
    _ensure_plan_redaction(spark)
    df = spark.range(3).select(
        F.aes_encrypt(
            F.col("id").cast("string").cast("binary"),
            F.lit(master),
            F.lit("GCM"),
        ).alias("ct")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    plan = buf.getvalue()
    assert master.hex() not in plan.lower(), "master key hex visible in plan"
    assert "redacted" in plan.lower()
