"""Kafka message deserialization: protobuf and schema-less JSON.

The reference's tap-kafka supports ``message_format: json | protobuf``
(tap-kafka/tap_kafka/__init__.py:93-97). For protobuf it compiles the
configured ``proto_schema`` with protoc and decodes Confluent-framed messages
to dicts (serialization/protobuf.py); for JSON it parses bytes directly
(serialization/json_with_no_schema.py).

Spark-first mapping:

- **JSON** → ``F.from_json`` with an explicit ``StructType`` — pure JVM path.
- **Protobuf** → prefer Spark's native ``from_protobuf`` when the
  spark-protobuf jar is on the classpath (`native_from_protobuf`). This
  environment ships neither the jar nor the python protobuf package, so the
  portable path is a clean-room wire-format codec below (implemented from the
  public protobuf encoding spec: varints, zigzag, length-delimited fields,
  packed repeats) run as an **Arrow-batched pandas UDF** that emits JSON;
  ``F.from_json`` then parses into a typed struct JVM-side. Per-row Python
  is the slow path by design budget: it is Arrow-batched, stateless, and
  embarrassingly parallel — at 100 TB it scales with executors and is
  swappable for ``from_protobuf`` without touching callers.

The schema source of truth is the ``.proto`` text itself (same contract as
the reference's ``proto_schema`` config) — parsed here into descriptors, a
Spark ``StructType``, and the codec tables.
"""

from __future__ import annotations

import base64
import json
import re
import struct
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SCALARS = {
    "double", "float", "int32", "int64", "uint32", "uint64", "sint32",
    "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64", "bool",
    "string", "bytes",
}

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool"}
_FIXED64_TYPES = {"fixed64", "sfixed64", "double"}
_FIXED32_TYPES = {"fixed32", "sfixed32", "float"}

_SPARK_TYPES = {
    "double": T.DoubleType(), "float": T.FloatType(),
    "int32": T.IntegerType(), "sint32": T.IntegerType(),
    "sfixed32": T.IntegerType(), "uint32": T.LongType(),
    "int64": T.LongType(), "sint64": T.LongType(),
    "sfixed64": T.LongType(), "fixed32": T.LongType(),
    # uint64/fixed64 can exceed int64; decoded value is reduced mod 2^64 and
    # may wrap — documented limitation (Spark has no unsigned 64-bit type)
    "uint64": T.LongType(), "fixed64": T.LongType(),
    "bool": T.BooleanType(), "string": T.StringType(),
    # bytes surface as base64 strings (JSON carrier has no binary); callers
    # wanting BinaryType apply F.unbase64 on the struct field
    "bytes": T.StringType(),
}


@dataclass
class ProtoField:
    name: str
    number: int
    type: str  # scalar name, or message/enum type name
    repeated: bool = False
    oneof_group: str | None = None  # set for members of a `oneof` block
    map_of: tuple[str, str] | None = None  # (key type, value type) for map<>


@dataclass
class ProtoMessage:
    name: str
    fields: dict[int, ProtoField] = field(default_factory=dict)  # by number

    def by_name(self) -> dict[str, ProtoField]:
        return {f.name: f for f in self.fields.values()}


@dataclass
class ProtoSchema:
    messages: dict[str, ProtoMessage]
    enums: dict[str, dict[int, str]]  # type name -> number -> label
    root: str  # first / configured top-level message

    def message(self, name: str | None = None) -> ProtoMessage:
        return self.messages[name or self.root]


_TOKEN = re.compile(
    r"""//[^\n]*|/\*.*?\*/           # comments
      | "(?:[^"\\]|\\.)*"            # string literal
      | [{}=;<>,]                       # punctuation
      | [A-Za-z_][A-Za-z0-9_.]*      # identifier
      | -?\d+                        # integer
    """,
    re.X | re.S,
)


def parse_proto(schema_text: str, root: str | None = None) -> ProtoSchema:
    """Minimal .proto parser: proto2/proto3 message + enum declarations with
    scalar / nested-message / repeated fields, plus ``oneof`` blocks
    (members inline into the PARENT's number space with their group
    recorded — on the wire they are ordinary optional fields where at
    most one is set; the decoder enforces last-wins ACROSS the group per
    spec merge semantics) and ``map<k, v>`` fields (wire format: repeated
    synthesized entry messages {key=1, value=2}; decoded to a dict with
    last-key-wins merge; keys surface as strings through the JSON
    carrier, matching protobuf's own MessageToDict). Options, services
    and imports are out of scope (the reference compiles arbitrary
    protos via protoc; this covers the wire-compatible core)."""
    toks = [
        t for t in _TOKEN.findall(schema_text)
        if not t.startswith("//") and not t.startswith("/*")
    ]

    messages: dict[str, ProtoMessage] = {}
    enums: dict[str, dict[int, str]] = {}
    first: str | None = None

    def parse_block(i: int, scope: str) -> int:
        nonlocal first
        kind = toks[i]  # 'message' | 'enum'
        name = toks[i + 1]
        full = f"{scope}.{name}" if scope else name
        assert toks[i + 2] == "{", f"expected '{{' after {kind} {name}"
        i += 3
        if kind == "enum":
            table: dict[int, str] = {}
            while toks[i] != "}":
                label, _eq, num = toks[i], toks[i + 1], toks[i + 2]
                table[int(num)] = label
                i += 3
                if toks[i] == ";":
                    i += 1
            enums[full] = enums[name] = table
            return i + 1
        msg = ProtoMessage(full)
        if first is None:
            first = full
        while toks[i] != "}":
            if toks[i] in ("message", "enum"):
                i = parse_block(i, full)
                continue
            if toks[i] == ";":
                i += 1
                continue
            if toks[i] == "oneof":
                # members live in the PARENT's number space (never
                # repeated, per spec); record the group for the decoder's
                # across-group last-wins rule
                group = toks[i + 1]
                assert toks[i + 2] == "{", f"expected '{{' after oneof {group}"
                i += 3
                while toks[i] != "}":
                    if toks[i] == ";":
                        i += 1
                        continue
                    ftype, fname, fnum = toks[i], toks[i + 1], toks[i + 3]
                    msg.fields[int(fnum)] = ProtoField(
                        fname, int(fnum), ftype, False, oneof_group=group
                    )
                    i += 4
                    while toks[i] != ";":
                        i += 1
                    i += 1
                i += 1
                continue
            if toks[i] == "map":
                # map < k , v > name = num ; — synthesize the spec's
                # entry message {key=1, value=2}; the wire field is a
                # repeated entry, the decoded value a dict
                assert toks[i + 1] == "<" and toks[i + 3] == ","
                ktype, vtype = toks[i + 2], toks[i + 4]
                assert toks[i + 5] == ">"
                fname, fnum = toks[i + 6], toks[i + 8]
                entry_name = f"{full}.__{fname}_Entry"
                entry = ProtoMessage(entry_name)
                entry.fields[1] = ProtoField("key", 1, ktype)
                entry.fields[2] = ProtoField("value", 2, vtype)
                messages[entry_name] = entry
                msg.fields[int(fnum)] = ProtoField(
                    fname, int(fnum), entry_name, True,
                    map_of=(ktype, vtype),
                )
                i += 9
                while toks[i] != ";":
                    i += 1
                i += 1
                continue
            repeated = False
            if toks[i] in ("repeated", "optional", "required"):
                repeated = toks[i] == "repeated"
                i += 1
            ftype, fname, _eq, fnum = toks[i], toks[i + 1], toks[i + 2], toks[i + 3]
            msg.fields[int(fnum)] = ProtoField(fname, int(fnum), ftype, repeated)
            i += 4
            while toks[i] != ";":  # skip field options `[default = x]`
                i += 1
            i += 1
        # register under both the fully-qualified and bare name (the mini
        # parser has no package semantics; bare-name lookup is what field
        # type references use)
        messages[full] = messages[name] = msg
        return i + 1

    i = 0
    while i < len(toks):
        if toks[i] in ("message", "enum"):
            i = parse_block(i, "")
        elif toks[i] in ("syntax", "package"):
            while toks[i] != ";":
                i += 1
            i += 1
        else:
            i += 1
    if first is None:
        raise ValueError("no message declaration found in proto schema")
    return ProtoSchema(messages, enums, root or first)


def spark_schema(schema: ProtoSchema, message: str | None = None) -> T.StructType:
    """StructType for a message: scalars per _SPARK_TYPES, enums as their
    label strings (matching the reference's MessageToDict output), nested
    messages as nested structs, ``repeated`` as arrays."""
    msg = schema.message(message)

    def resolve(t: str) -> T.DataType:
        if t in _SPARK_TYPES:
            return _SPARK_TYPES[t]
        if t in schema.enums:
            return T.StringType()
        if t in schema.messages:
            return spark_schema(schema, t)
        raise ValueError(f"unknown field type {t!r}")

    fields = []
    for f_ in sorted(msg.fields.values(), key=lambda f_: f_.number):
        if f_.map_of is not None:
            # JSON-carrier map keys are strings (protobuf MessageToDict
            # stringifies them too); values keep their typed schema
            dt: T.DataType = T.MapType(T.StringType(), resolve(f_.map_of[1]))
        else:
            dt = resolve(f_.type)
            if f_.repeated:
                dt = T.ArrayType(dt)
        fields.append(T.StructField(f_.name, dt, nullable=True))
    return T.StructType(fields)


# ---------------------------------------------------------------- wire codec


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = value = 0
    while True:
        b = buf[i]
        value |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return value, i
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(value: int) -> bytes:
    out = bytearray()
    value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _from_zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _decode_scalar(ftype: str, wire: int, value):
    if ftype in ("sint32", "sint64"):
        return _from_zigzag(value)
    if ftype in ("int32", "int64"):
        return value - (1 << 64) if value >= (1 << 63) else value
    if ftype == "bool":
        return bool(value)
    if ftype == "double":
        return struct.unpack("<d", value)[0]
    if ftype == "float":
        return struct.unpack("<f", value)[0]
    if ftype in ("sfixed64", "sfixed32"):
        fmt = "<q" if ftype == "sfixed64" else "<i"
        return struct.unpack(fmt, value)[0]
    if ftype in ("fixed64", "fixed32"):
        fmt = "<Q" if ftype == "fixed64" else "<I"
        return struct.unpack(fmt, value)[0]
    if ftype == "string":
        return value.decode("utf-8")
    if ftype == "bytes":
        return base64.b64encode(value).decode("ascii")
    return value  # uint32/uint64 varint as-is


def decode_message(
    buf: bytes, schema: ProtoSchema, message: str | None = None
) -> dict:
    """Decode one protobuf message to a dict (unknown fields skipped,
    last-value-wins for non-repeated — per spec merge semantics)."""
    msg = schema.message(message)
    out: dict = {}
    i, end = 0, len(buf)
    while i < end:
        tag, i = _read_varint(buf, i)
        fnum, wire = tag >> 3, tag & 7
        f_ = msg.fields.get(fnum)
        if wire == 0:
            raw, i = _read_varint(buf, i)
        elif wire == 1:
            raw, i = buf[i:i + 8], i + 8
        elif wire == 5:
            raw, i = buf[i:i + 4], i + 4
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            raw, i = buf[i:i + ln], i + ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if f_ is None:
            continue  # unknown field: skip
        if f_.type in schema.enums and f_.type not in SCALARS:
            vals = [raw] if wire == 0 else _unpack_packed("int32", raw)
            vals = [schema.enums[f_.type].get(v, str(v)) for v in vals]
        elif f_.type in schema.messages:
            vals = [decode_message(raw, schema, f_.type)]
        elif f_.repeated and wire == 2 and f_.type not in ("string", "bytes"):
            vals = _unpack_packed(f_.type, raw)  # packed repeated scalars
        else:
            vals = [_decode_scalar(f_.type, wire, raw)]
        if f_.map_of is not None:
            d = out.setdefault(f_.name, {})
            kt, vt = f_.map_of
            for e in vals:  # each val is a decoded entry message
                # proto3: an entry omitting key/value means the type's
                # default, and bool keys stringify JSON-style
                # ('true'/'false', like MessageToDict — not Python
                # 'True'/'False')
                k = e.get("key", _proto3_default(kt, schema))
                if kt == "bool":
                    k = "true" if k else "false"
                val = e.get(
                    "value", _proto3_default(vt, schema, map_value=True)
                )
                d[str(k)] = val  # last key wins
        elif f_.repeated:
            out.setdefault(f_.name, []).extend(vals)
        else:
            if f_.oneof_group is not None:
                # spec merge rule: the LAST member of a oneof seen on the
                # wire wins and clears any earlier-set sibling
                for sib in msg.fields.values():
                    if (
                        sib.oneof_group == f_.oneof_group
                        and sib.name != f_.name
                    ):
                        out.pop(sib.name, None)
            out[f_.name] = vals[-1]
    return out


def _proto3_default(ftype: str, schema: ProtoSchema, map_value: bool = False):
    """proto3 default for an absent scalar/enum/message field.

    ``map_value`` distinguishes the two message-typed cases: a map entry
    with an omitted message VALUE means an empty message ``{}`` (the
    MessageToDict contract), while an absent singular submessage field
    means "not set" → None."""
    if ftype == "bool":
        return False
    if ftype == "string":
        return ""
    if ftype == "bytes":
        return b""
    if ftype in ("double", "float"):
        return 0.0
    if ftype in SCALARS:
        return 0
    if ftype in schema.enums:  # enum default: the 0-numbered label
        return schema.enums[ftype].get(0, "0")
    # message-typed: omitted map VALUE ≡ empty message; absent singular
    # submessage ≡ not set
    return {} if map_value else None


def _unpack_packed(ftype: str, raw: bytes) -> list:
    vals, i = [], 0
    while i < len(raw):
        if ftype in _VARINT_TYPES:
            v, i = _read_varint(raw, i)
            vals.append(_decode_scalar(ftype, 0, v))
        elif ftype in _FIXED64_TYPES:
            vals.append(_decode_scalar(ftype, 1, raw[i:i + 8]))
            i += 8
        else:
            vals.append(_decode_scalar(ftype, 5, raw[i:i + 4]))
            i += 4
    return vals


def _encode_scalar(ftype: str, v) -> bytes:
    if ftype in ("sint32", "sint64"):
        return _write_varint(_to_zigzag(int(v)))
    if ftype in _VARINT_TYPES:
        return _write_varint(int(v))
    if ftype == "double":
        return struct.pack("<d", float(v))
    if ftype == "float":
        return struct.pack("<f", float(v))
    if ftype == "sfixed64":
        return struct.pack("<q", int(v))
    if ftype == "sfixed32":
        return struct.pack("<i", int(v))
    if ftype == "fixed64":
        return struct.pack("<Q", int(v))
    if ftype == "fixed32":
        return struct.pack("<I", int(v))
    if ftype == "string":
        b = str(v).encode("utf-8")
        return _write_varint(len(b)) + b
    if ftype == "bytes":
        b = base64.b64decode(v) if isinstance(v, str) else bytes(v)
        return _write_varint(len(b)) + b
    raise ValueError(ftype)


def encode_message(
    obj: dict, schema: ProtoSchema, message: str | None = None
) -> bytes:
    """Encode a dict as protobuf bytes (test-fixture / round-trip support;
    the reference only deserializes). Repeated scalars are packed."""
    msg = schema.message(message)
    out = bytearray()
    for f_ in sorted(msg.fields.values(), key=lambda f_: f_.number):
        if f_.name not in obj or obj[f_.name] is None:
            continue
        v = obj[f_.name]
        if f_.map_of is not None:
            # dict → repeated entry messages; keys re-coerce from the
            # carrier's string form (ints via int(), bool via the
            # JSON-style 'true'/'false' the decoder emits)
            kt = f_.map_of[0]

            def _key(k, kt=kt):
                if kt == "bool":
                    return 1 if str(k).lower() in ("true", "1") else 0
                if kt == "string":
                    return k
                return int(k)  # spec: all other legal key types integral

            v = [{"key": _key(k), "value": val} for k, val in v.items()]
        if f_.type in schema.enums and f_.type not in SCALARS:
            rev = {lbl: n for n, lbl in schema.enums[f_.type].items()}
            vs = v if f_.repeated else [v]
            nums = [rev[x] if isinstance(x, str) else int(x) for x in vs]
            if f_.repeated:
                payload = b"".join(_write_varint(n) for n in nums)
                out += _write_varint(f_.number << 3 | 2)
                out += _write_varint(len(payload)) + payload
            else:
                out += _write_varint(f_.number << 3) + _write_varint(nums[0])
        elif f_.type in schema.messages:
            for item in v if f_.repeated else [v]:
                body = encode_message(item, schema, f_.type)
                out += _write_varint(f_.number << 3 | 2)
                out += _write_varint(len(body)) + body
        elif f_.repeated and f_.type not in ("string", "bytes"):
            payload = b"".join(_encode_scalar(f_.type, x) for x in v)
            out += _write_varint(f_.number << 3 | 2)
            out += _write_varint(len(payload)) + payload
        else:
            wire = (
                0 if f_.type in _VARINT_TYPES
                else 1 if f_.type in _FIXED64_TYPES
                else 5 if f_.type in _FIXED32_TYPES
                else 2
            )
            for item in v if f_.repeated else [v]:
                out += _write_varint(f_.number << 3 | wire)
                out += _encode_scalar(f_.type, item)
    return bytes(out)


# ---------------------------------------------------- Confluent wire framing


def strip_confluent_frame(buf: bytes) -> bytes:
    """Remove the Confluent Schema-Registry frame the reference's
    ProtobufDeserializer consumes: magic 0x00, 4-byte schema id, then a
    varint-length message-index array."""
    if not buf or buf[0] != 0:
        raise ValueError("not a Confluent-framed message (magic byte != 0)")
    i = 5  # magic + schema id
    n, i = _read_varint(buf, i)
    for _ in range(n):
        _, i = _read_varint(buf, i)
    return buf[i:]


def confluent_frame(buf: bytes, schema_id: int = 1) -> bytes:
    """Frame a message the way Confluent producers do (fixture support)."""
    return b"\x00" + struct.pack(">I", schema_id) + _write_varint(0) + buf


# ------------------------------------------------------------ Spark surface


def native_from_protobuf(col, message_name: str, desc_file_path: str):
    """Spark's built-in from_protobuf (requires the spark-protobuf jar —
    absent in this environment; kept as the preferred big-cluster path)."""
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(col, message_name, descFilePath=desc_file_path)


def native_protobuf_available(spark) -> bool:
    """True when the spark-protobuf connector jar is on the JVM classpath.
    Probe the IMPLEMENTATION class, not ``...protobuf.functions`` — the
    thin functions wrapper ships inside spark-sql and loads even when the
    connector (and thus the actual decoder) is absent."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:
        return False


def from_protobuf_auto(
    col: Column, proto_schema_text: str, message: str | None = None,
    confluent: bool = False, desc_file_path: str | None = None,
    spark=None,
) -> Column:
    """Decode protobuf binary → typed struct through the best available
    path, checked at runtime in this order:

    1. native ``from_protobuf`` — when the spark-protobuf jar is on the
       classpath AND a compiled descriptor file is supplied (the native API
       consumes protoc's FileDescriptorSet, not ``.proto`` text) AND the
       frame is not Confluent-framed (the native decoder has no frame
       stripping);
    2. otherwise the Arrow-batched pure-python codec (``from_protobuf_py``).

    The moment the environment ships the jar the slow path disappears with
    no change at call sites."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    if (
        desc_file_path
        and not confluent
        and spark is not None
        and native_protobuf_available(spark)
    ):
        name = message or parse_proto(proto_schema_text).root
        return native_from_protobuf(col, name, desc_file_path)
    return from_protobuf_py(col, proto_schema_text, message, confluent)


def protobuf_decode_json(
    col: Column, proto_schema_text: str, message: str | None = None,
    confluent: bool = False,
) -> Column:
    """Binary column → JSON-string column via the pure-python codec
    (Arrow-batched; the schema is parsed once per executor, not per row)."""
    schema = parse_proto(proto_schema_text, root=message)

    @pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            data = bytes(b)
            if confluent:
                data = strip_confluent_frame(data)
            return json.dumps(decode_message(data, schema))

        return s.map(one)

    return _decode(col)


def from_protobuf_py(
    col: Column, proto_schema_text: str, message: str | None = None,
    confluent: bool = False,
) -> Column:
    """Drop-in analogue of ``from_protobuf``: binary column → typed struct.
    Decode runs Arrow-batched in Python; JSON→struct parsing runs JVM-side
    through ``from_json`` so every downstream expression stays in codegen."""
    schema = parse_proto(proto_schema_text, root=message)
    return F.from_json(
        protobuf_decode_json(col, proto_schema_text, message, confluent),
        spark_schema(schema),
    )


def protobuf_encode(
    df: DataFrame, proto_schema_text: str, message: str | None = None,
    payload_cols: list[str] | None = None, out_col: str = "message",
    confluent: bool = False,
) -> DataFrame:
    """Encode columns into a protobuf binary column (fixture/producer side).
    Field values are taken from same-named columns."""
    schema = parse_proto(proto_schema_text, root=message)
    names = [
        f_.name for f_ in schema.message().fields.values()
        if payload_cols is None or f_.name in payload_cols
    ]

    @pandas_udf(T.BinaryType())
    def _encode(it: pd.DataFrame) -> pd.Series:
        def one(row):
            b = encode_message(dict(zip(names, row)), schema)
            return confluent_frame(b) if confluent else b

        return pd.Series([one(r) for r in zip(*[it[n] for n in names])])

    st = F.struct(*[F.col(n) for n in names])
    return df.withColumn(out_col, _encode(st))


def from_json_payload(col: Column, ddl_schema: str) -> Column:
    """tap-kafka's ``message_format: json`` path: parse JSON payload bytes/
    string into a typed struct — fully JVM-side (serialization/
    json_with_no_schema.py's Spark equivalent)."""
    return F.from_json(col.cast("string"), ddl_schema)
