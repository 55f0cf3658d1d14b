from pipelinewise_spark.schema.jsonschema import (  # noqa: F401
    json_schema_to_struct,
    merge_schemas,
    struct_to_json_schema,
)
