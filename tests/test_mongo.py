from __future__ import annotations

from pipelinewise_spark.sources.mongo import document_field, normalize_documents


def test_normalize_documents_id_classes(spark):
    docs = [
        ('{"_id": {"$oid": "64f0c2a9e4b0a1b2c3d4e5f6"}, "name": "a"}',),
        ('{"_id": {"$date": "2026-01-01T00:00:00Z"}, "name": "b"}',),
        ('{"_id": {"$uuid": "123e4567-e89b-12d3-a456-426614174000"}, "n": 1}',),
        ('{"_id": "plain-string", "name": "d"}',),
        ('{"_id": 42, "name": "e"}',),
        ('{"name": "no-id"}',),
    ]
    df = spark.createDataFrame(docs, "doc string")
    out = normalize_documents(df, "doc")
    ids = [r._id for r in out.collect()]
    assert ids == [
        "64f0c2a9e4b0a1b2c3d4e5f6",
        "2026-01-01T00:00:00Z",
        "123e4567-e89b-12d3-a456-426614174000",
        "plain-string",
        "42",
    ]
    named = document_field(out, "name").collect()
    assert [r.name for r in named] == ["a", "b", None, "d", "e"]
