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
        "2026-01-01T00:00:00.000000Z",  # singer strftime: micros + Z
        "123e4567-e89b-12d3-a456-426614174000",
        "plain-string",
        "42",
    ]
    named = document_field(out, "name").collect()
    assert [r.name for r in named] == ["a", "b", None, "d", "e"]


def test_transform_value_bson_menagerie():
    """Reference transform_value conversion table parity
    (fastsync/commons/tap_mongodb.py:120-155)."""
    import json

    from pipelinewise_spark.sources.mongo import (
        class_to_string,
        serialize_document,
        transform_value,
    )

    doc = {
        "_id": {"$oid": "64f0c2a9e4b0a1b2c3d4e5f6"},
        "dec": {"$numberDecimal": "1234567890.123456789"},
        "big": {"$numberLong": "9007199254740993"},
        "small": {"$numberInt": "7"},
        "dbl": {"$numberDouble": "2.5"},
        "bin": {"$binary": {"base64": "AAEC", "subType": "00"}},
        "uid": {"$uuid": "123e4567-e89b-12d3-a456-426614174000"},
        "when": {"$date": {"$numberLong": "1704067200123"}},
        "oplog_ts": {"$timestamp": {"t": 1704067200, "i": 5}},
        "rx": {"$regularExpression": {"pattern": "^a.*", "options": "i"}},
        "fn": {"$code": "function(){}"},
        "fn2": {"$code": "f()", "$scope": {"x": 1}},
        "ref": {"$ref": "other", "$id": {"$oid": "64f0c2a9e4b0a1b2c3d4e5f7"},
                "$db": "mydb"},
        "lo": {"$minKey": 1},
        "hi": {"$maxKey": 1},
        "nested": {"a": [{"$numberLong": "1"}, {"$date": "1970-01-01T00:00:00Z"}]},
    }
    out = serialize_document(doc)
    assert "lo" not in out and "hi" not in out  # MinKey/MaxKey dropped
    assert out["_id"] == "64f0c2a9e4b0a1b2c3d4e5f6"
    assert out["dec"] == "1234567890.123456789"
    assert out["big"] == 9007199254740993
    assert out["small"] == 7
    assert out["dbl"] == 2.5
    assert out["bin"] == "AAEC"
    assert out["uid"] == "123e4567-e89b-12d3-a456-426614174000"
    assert out["when"] == "2024-01-01T00:00:00.123000Z"
    assert out["oplog_ts"] == "2024-01-01T00:00:00.000000Z"
    assert out["rx"] == {"pattern": "^a.*", "flags": "i"}
    assert out["fn"] == "function(){}"
    assert out["fn2"] == {"value": "f()", "scope": "{'x': 1}"}
    assert out["ref"] == {
        "id": "64f0c2a9e4b0a1b2c3d4e5f7", "collection": "other",
        "database": "mydb",
    }
    assert out["nested"] == {"a": [1, "1970-01-01T00:00:00.000000Z"]}
    json.dumps(out)  # json-friendly: serializes cleanly

    # _id key class encodings (class_to_string:47-79)
    assert class_to_string({"$timestamp": {"t": 10, "i": 2}}) == "10.2"
    assert class_to_string({"$date": "2026-02-03T04:05:06.000007Z"}) == (
        "2026-02-03T04:05:06.000007Z"
    )
    assert class_to_string({"$binary": {"base64": "AAEC", "subType": "00"}}) == "AAEC"
    assert class_to_string(3.5) == "3.5"
    assert transform_value({"$date": {"$numberLong": "-86400000"}}) == (
        "1969-12-31T00:00:00.000000Z"  # pre-epoch canonical $date
    )


def test_normalize_documents_full_docs(spark):
    docs = [
        (
            '{"_id": {"$oid": "64f0c2a9e4b0a1b2c3d4e5f6"},'
            ' "amount": {"$numberDecimal": "10.50"},'
            ' "at": {"$date": {"$numberLong": "1704067200000"}},'
            ' "tags": [{"$numberInt": "1"}, {"$numberInt": "2"}]}',
        ),
    ]
    df = spark.createDataFrame(docs, "doc string")
    out = normalize_documents(df, "doc")
    row = out.collect()[0]
    assert row._id == "64f0c2a9e4b0a1b2c3d4e5f6"
    import json

    d = json.loads(row.document)
    assert d == {
        "_id": "64f0c2a9e4b0a1b2c3d4e5f6",
        "amount": "10.50",
        "at": "2024-01-01T00:00:00.000000Z",
        "tags": [1, 2],
    }
