"""JSON-Schema ↔ Spark StructType bridge + schema diff/merge.

The reference's wire format is JSON Schema per stream (discovered from source
catalogs — tap-postgres discovery_utils.py:188-283 emits the patterns mapped
below; Snowflake DDL mapping target_snowflake/db_sync.py:75-108). Our engine
speaks StructType; this module converts both ways using the SURVEY §1.3 type
table, and implements the reference's schema-diff semantics
(``merge_schemas`` pipelinewise.py:493-692: new/modified fields flagged) that
drive evolution decisions.

Decimal note: the reference maps numeric(p,s) → ``number`` → warehouse FLOAT
(db_sync.py:92-93), losing exactness. We map multipleOf-carrying numbers to
DecimalType (doing it right) and keep ``float_compat=True`` to reproduce the
reference's behavior bit-for-bit when parity matters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import types as T


def _base_types(js: dict[str, Any]) -> list[str]:
    t = js.get("type", [])
    if isinstance(t, str):
        t = [t]
    return [x for x in t if x != "null"]


def json_schema_to_struct(
    schema: dict[str, Any], float_compat: bool = False
) -> T.StructType:
    """Singer stream JSON Schema → StructType (properties in order)."""
    fields = []
    for name, prop in (schema.get("properties") or {}).items():
        fields.append(
            T.StructField(name, _prop_to_type(prop, float_compat), nullable=True)
        )
    return T.StructType(fields)


def _prop_to_type(prop: dict[str, Any], float_compat: bool) -> T.DataType:
    types = _base_types(prop)
    fmt = prop.get("format")
    if "object" in types:
        # schemaless objects (json/jsonb/hstore) ride as JSON strings; typed
        # sub-properties become a struct
        if prop.get("properties"):
            return json_schema_to_struct(prop, float_compat)
        return T.StringType()
    if "array" in types:
        items = prop.get("items")
        if isinstance(items, dict) and not items.get("$ref"):
            return T.ArrayType(_prop_to_type(items, float_compat))
        # sdc_recursive_* ragged arrays: JSON-string fallback (SURVEY §7)
        return T.StringType()
    if "boolean" in types:
        return T.BooleanType()
    if "integer" in types:
        return T.LongType()
    if "number" in types:
        if not float_compat and "multipleOf" in prop:
            # numeric(p,s): multipleOf = 10^-s (discovery_utils.py:234-244)
            s = max(0, round(-_log10(prop["multipleOf"])))
            return T.DecimalType(38, min(s, 18))
        return T.DoubleType()
    if "string" in types or not types:
        if fmt == "date-time":
            return T.TimestampType()
        if fmt == "binary":
            return T.BinaryType()
        if fmt == "time":
            return T.StringType()  # HH:mm:ss, TZ already dropped upstream
        return T.StringType()
    return T.StringType()


def _log10(x: float) -> float:
    import math

    return math.log10(x) if x > 0 else 0.0


def struct_to_json_schema(struct: T.StructType) -> dict[str, Any]:
    """StructType → Singer-style JSON Schema."""
    props: dict[str, Any] = {}
    for f in struct.fields:
        props[f.name] = _type_to_prop(f.dataType)
    return {"type": "object", "properties": props}


def _type_to_prop(dt: T.DataType) -> dict[str, Any]:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": ["null", "integer"]}
    if isinstance(dt, T.DecimalType):
        return {"type": ["null", "number"], "multipleOf": 10 ** -dt.scale}
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return {"type": ["null", "number"]}
    if isinstance(dt, T.BooleanType):
        return {"type": ["null", "boolean"]}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": ["null", "string"], "format": "date-time"}
    if isinstance(dt, T.DateType):
        return {"type": ["null", "string"], "format": "date-time"}
    if isinstance(dt, T.BinaryType):
        return {"type": ["null", "string"], "format": "binary"}
    if isinstance(dt, T.ArrayType):
        return {"type": ["null", "array"], "items": _type_to_prop(dt.elementType)}
    if isinstance(dt, T.StructType):
        return {
            "type": ["null", "object"],
            "properties": {
                f.name: _type_to_prop(f.dataType) for f in dt.fields
            },
        }
    return {"type": ["null", "string"]}


@dataclass
class SchemaDiff:
    added: list[str]
    modified: list[tuple[str, str, str]]  # (name, old_type, new_type)
    removed: list[str]

    @property
    def changed(self) -> bool:
        return bool(self.added or self.modified or self.removed)


def merge_schemas(old: T.StructType, new: T.StructType) -> SchemaDiff:
    """Diff two stream schemas the way the reference's discovery merge does
    (new fields ``is-new``, type changes ``is-modified``; removed fields are
    reported but never dropped from the target)."""
    old_f = {f.name.lower(): f for f in old.fields}
    new_f = {f.name.lower(): f for f in new.fields}
    added = [f.name for f in new.fields if f.name.lower() not in old_f]
    removed = [f.name for f in old.fields if f.name.lower() not in new_f]
    modified = [
        (
            f.name,
            old_f[f.name.lower()].dataType.simpleString(),
            f.dataType.simpleString(),
        )
        for f in new.fields
        if f.name.lower() in old_f
        and old_f[f.name.lower()].dataType != f.dataType
    ]
    return SchemaDiff(added=added, modified=modified, removed=removed)
