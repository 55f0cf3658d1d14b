"""Protobuf wire-format codec + Kafka message deserialization.

Golden byte vectors come from the public protobuf encoding documentation
(e.g. field-1 varint 150 encodes as ``08 96 01``) so the decoder is checked
against the spec, not just against our own encoder.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pipelinewise_spark.streaming.serialization import (
    confluent_frame,
    decode_message,
    encode_message,
    from_json_payload,
    from_protobuf_py,
    parse_proto,
    protobuf_encode,
    spark_schema,
    strip_confluent_frame,
)

PROTO = """
syntax = "proto3";
package demo;

message Event {
  int64 event_id = 1;
  string event_type = 2;
  double value = 3;
  sint64 delta = 4;
  bool flag = 5;
  repeated int32 tags = 6;
  Meta meta = 7;
  Level level = 8;
  bytes blob = 9;
  fixed32 checksum = 10;

  message Meta {
    string k = 1;
    int64 v = 2;
  }

  enum Level {
    DEBUG = 0;
    INFO = 1;
    ERROR = 2;
  }
}
"""


def test_golden_spec_vectors():
    # protobuf docs: `message Test1 { int32 a = 1; }` with a=150 -> 08 96 01
    s = parse_proto("message Test1 { int32 a = 1; }")
    assert decode_message(bytes.fromhex("089601"), s) == {"a": 150}
    assert encode_message({"a": 150}, s) == bytes.fromhex("089601")

    # docs: `message Test2 { string b = 2; }` b="testing" -> 12 07 "testing"
    s2 = parse_proto("message Test2 { string b = 2; }")
    raw = bytes.fromhex("120774657374696e67")
    assert decode_message(raw, s2) == {"b": "testing"}
    assert encode_message({"b": "testing"}, s2) == raw

    # docs: packed `repeated int32 d = 4` [3,270,86942] -> 22 06 03 8E 02 9E A7 05
    s3 = parse_proto("message Test4 { repeated int32 d = 4; }")
    raw3 = bytes.fromhex("2206038e029ea705")
    assert decode_message(raw3, s3) == {"d": [3, 270, 86942]}
    assert encode_message({"d": [3, 270, 86942]}, s3) == raw3

    # negative int64 is a 10-byte varint; sint64 zigzags
    sneg = parse_proto("message N { int64 a = 1; sint64 b = 2; }")
    assert decode_message(encode_message({"a": -2, "b": -2}, sneg), sneg) == {
        "a": -2, "b": -2,
    }


def test_unknown_fields_skipped_and_last_wins():
    s = parse_proto("message Test1 { int32 a = 1; }")
    # field 2 (unknown, varint) + field 1 twice: spec says last value wins
    buf = bytes.fromhex("1005") + bytes.fromhex("0801") + bytes.fromhex("089601")
    assert decode_message(buf, s) == {"a": 150}


def test_full_message_roundtrip():
    s = parse_proto(PROTO)
    obj = {
        "event_id": 1 << 40,
        "event_type": "click",
        "value": -3.75,
        "delta": -12345,
        "flag": True,
        "tags": [1, -2, 300],
        "meta": {"k": "user", "v": 99},
        "level": "ERROR",
        "blob": "AAEC",  # base64 of b"\x00\x01\x02"
        "checksum": 4022250974,
    }
    assert decode_message(encode_message(obj, s), s) == obj


def test_confluent_framing():
    s = parse_proto("message Test1 { int32 a = 1; }")
    framed = confluent_frame(encode_message({"a": 7}, s), schema_id=42)
    assert framed[0] == 0
    assert decode_message(strip_confluent_frame(framed), s) == {"a": 7}


def test_spark_schema_mapping():
    st = spark_schema(parse_proto(PROTO))
    d = {f.name: f.dataType.simpleString() for f in st.fields}
    assert d == {
        "event_id": "bigint", "event_type": "string", "value": "double",
        "delta": "bigint", "flag": "boolean", "tags": "array<int>",
        "meta": "struct<k:string,v:bigint>", "level": "string",
        "blob": "string", "checksum": "bigint",
    }


def test_spark_encode_decode_roundtrip(spark, sf_dir):
    from pipelinewise_spark.sources.files import read_table

    events = read_table(spark, sf_dir, "events").limit(200)
    proto = """
    message Ev {
      int64 event_id = 1;
      int64 user_id = 2;
      string event_type = 3;
      double value = 4;
      string props = 5;
      int64 ts_us = 6;
    }
    """
    src = events.withColumn("ts_us", F.unix_micros("ts"))
    encoded = protobuf_encode(src, proto, confluent=True)
    decoded = encoded.select(
        F.col("event_id").alias("orig_id"),
        from_protobuf_py(F.col("message"), proto, confluent=True).alias("m"),
    )
    back = decoded.select("orig_id", "m.*")
    rows = {r.event_id: r for r in back.collect()}
    orig = {r.event_id: r for r in src.collect()}
    assert set(rows) == set(orig)
    for k, r in rows.items():
        assert r.orig_id == k
        o = orig[k]
        assert (r.user_id, r.event_type, r.props, r.ts_us) == (
            o.user_id, o.event_type, o.props, o.ts_us
        )
        assert abs(r.value - o.value) < 1e-12


def test_from_json_payload(spark, sf_dir):
    from pipelinewise_spark.sources.files import read_table

    events = read_table(spark, sf_dir, "events").limit(50)
    parsed = events.select(
        "event_id", from_json_payload(F.col("props"), "k int").alias("p")
    ).select("event_id", "p.k")
    got = {r.event_id: r.k for r in parsed.collect()}
    import json as _json

    exp = {
        r.event_id: _json.loads(r.props)["k"] for r in events.collect()
    }
    assert got == exp


def test_from_protobuf_auto_dispatch_order(spark, monkeypatch):
    """Jar absent → Arrow codec; jar present + descriptor file → native;
    Confluent framing or no descriptor always falls back to the codec
    (the native decoder strips no frames and parses no .proto text)."""
    import pipelinewise_spark.streaming.serialization as S

    calls = []
    monkeypatch.setattr(
        S, "native_from_protobuf",
        lambda col, name, desc: calls.append(("native", name)) or F.lit(None),
    )

    # environment truth: the jar is absent here
    assert S.native_protobuf_available(spark) is False
    S.from_protobuf_auto(F.lit(b""), PROTO, desc_file_path="/x.desc", spark=spark)
    assert calls == []  # codec path, native never touched

    monkeypatch.setattr(S, "native_protobuf_available", lambda s: True)
    S.from_protobuf_auto(F.lit(b""), PROTO, desc_file_path="/x.desc", spark=spark)
    assert [c[0] for c in calls] == ["native"]
    assert calls[0][1]  # message name resolved from the parsed .proto root

    calls.clear()
    # no descriptor file -> codec even with the jar
    S.from_protobuf_auto(F.lit(b""), PROTO, spark=spark)
    # Confluent-framed -> codec even with jar + descriptor
    S.from_protobuf_auto(
        F.lit(b""), PROTO, confluent=True, desc_file_path="/x.desc", spark=spark
    )
    assert calls == []


def test_oneof_members_inline_into_parent():
    proto = """
    syntax = "proto3";
    message Event {
      int64 id = 1;
      oneof payload {
        string text = 2;
        int64 num = 3;
        Inner obj = 4;
      }
      string tail = 5;
      message Inner { string s = 1; }
    }
    """
    sch = parse_proto(proto)
    msg = sch.message()
    assert msg.fields[2].oneof_group == "payload"
    assert msg.fields[3].oneof_group == "payload"
    assert msg.fields[4].oneof_group == "payload"
    assert msg.fields[1].oneof_group is None
    assert msg.fields[5].oneof_group is None
    st = spark_schema(sch)
    assert [f.name for f in st.fields] == ["id", "text", "num", "obj", "tail"]


def test_oneof_roundtrip_and_last_wins_across_group():
    proto = """
    message Event {
      int64 id = 1;
      oneof payload { string text = 2; int64 num = 3; }
    }
    """
    sch = parse_proto(proto)
    # single member set: plain roundtrip
    b = encode_message({"id": 7, "num": 42}, sch)
    assert decode_message(b, sch) == {"id": 7, "num": 42}
    # wire carries BOTH members (merge of two partials): the LAST member
    # seen wins and the earlier sibling is CLEARED, per spec
    both = encode_message({"id": 7, "text": "hi"}, sch) + encode_message(
        {"num": 9}, sch
    )
    assert decode_message(both, sch) == {"id": 7, "num": 9}
    # and in the other order
    both2 = encode_message({"num": 9}, sch) + encode_message(
        {"text": "hi"}, sch
    )
    assert decode_message(both2, sch) == {"text": "hi"}


def test_map_field_parse_decode_roundtrip():
    proto = """
    syntax = "proto3";
    message Event {
      int64 id = 1;
      map<string, int64> counts = 2;
      map<int32, string> names = 3;
      map<string, Inner> objs = 4;
      message Inner { string s = 1; }
    }
    """
    sch = parse_proto(proto)
    obj = {
        "id": 1,
        "counts": {"a": 2, "b": 3},
        "names": {"7": "x"},
        "objs": {"k": {"s": "v"}},
    }
    assert decode_message(encode_message(obj, sch), sch) == obj
    # duplicate key across merged partials: last wins
    dup = encode_message({"counts": {"a": 1}}, sch) + encode_message(
        {"counts": {"a": 9, "z": 5}}, sch
    )
    assert decode_message(dup, sch)["counts"] == {"a": 9, "z": 5}


def test_map_field_through_spark_json_carrier(spark):
    import pyspark.sql.types as T

    proto = """
    message Doc { int64 id = 1; map<string, int64> tags = 2; }
    """
    sch = parse_proto(proto)
    st = spark_schema(sch)
    assert isinstance(st["tags"].dataType, T.MapType)
    payloads = [
        (i, encode_message({"id": i, "tags": {"a": i, "b": i * 2}}, sch))
        for i in range(5)
    ]
    df = spark.createDataFrame(payloads, "orig long, message binary")
    back = df.select(
        "orig", from_protobuf_py(F.col("message"), proto).alias("m")
    ).select("orig", "m.id", "m.tags")
    for r in back.collect():
        assert r.id == r.orig and r.tags == {"a": r.orig, "b": r.orig * 2}
