"""MongoDB-style document source normalization.

The reference serializes BSON documents to a two-column shape —
``_id`` (class-encoded string key) + ``document`` (the whole doc as JSON) —
handling ObjectId/UUID/date/int id classes
(/root/reference/pipelinewise/fastsync/commons/tap_mongodb.py:32-155).

Spark mapping: documents arrive as JSON lines (mongoexport / Debezium /
the MongoDB Spark connector's extended-JSON); normalization is pure Column
work — extract + class-encode the id, keep the full document string. BSON
decode itself is out of scope (connector territory); the *shape contract*
is what downstream sync operators (MERGE by ``_id``, change-stream apply)
depend on, and that is what's implemented and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ID_FIELD = "_id"
DOC_COLUMN = "document"


def _encode_id(raw: F.Column) -> F.Column:
    """Class-encode extended-JSON ids the way the reference does:
    ObjectId → hex string, date → ISO string, UUID → uuid string, scalars →
    str(value). Extended JSON wraps classes as {"$oid": ...}, {"$date": ...},
    {"$uuid": ...}."""
    oid = F.get_json_object(raw, "$.$oid")
    date = F.get_json_object(raw, "$.$date")
    uuid = F.get_json_object(raw, "$.$uuid")
    return F.coalesce(oid, date, uuid, raw)


def normalize_documents(df: DataFrame, json_col: str) -> DataFrame:
    """JSON-document frame → (_id string, document string) rows.

    Rows with no id are dropped (the reference requires ``_id`` as PK for
    Mongo streams)."""
    raw_id = F.get_json_object(F.col(json_col), "$." + ID_FIELD)
    return (
        df.select(
            _encode_id(raw_id).alias(ID_FIELD),
            F.col(json_col).cast("string").alias(DOC_COLUMN),
        )
        .filter(F.col(ID_FIELD).isNotNull())
    )


def document_field(df: DataFrame, path: str, alias: str | None = None) -> DataFrame:
    """Project a field out of the document column on demand
    (the VARIANT-column access pattern)."""
    return df.withColumn(
        alias or path.replace(".", "_"),
        F.get_json_object(F.col(DOC_COLUMN), "$." + path),
    )
