"""YAML pipeline compiler — the engine's ``pipelinewise import``.

The reference compiles YAML project files (tap + target) into per-connector
JSON configs and Singer catalogs (cli/config.py:30-125, 258-302; YAML shape
cli/samples/*.yml.sample). We keep the same YAML spirit:

    id: mysql_to_lake
    target_path: /lake
    schemas:
      - source_schema: my_db
        target_schema: repl
        tables:
          - table_name: orders
            replication_method: INCREMENTAL
            replication_key: updated_at
            primary_keys: [id]
            transformations:
              - column: email
                type: HASH
              - column: phone
                type: MASK-STRING-SKIP-ENDS-3
                when:
                  - column: country
                    equals: GB

and compile straight to a PipelineSpec (stream id = ``schema-table``, the
Singer tap_stream_id convention).
"""

from __future__ import annotations

from typing import Any

from pipelinewise_spark.plans.spec import (
    PipelineSpec,
    ReplicationMethod,
    StreamSpec,
    TransformationSpec,
)


def compile_yaml(text: str, vault_secret: str | None = None) -> PipelineSpec:
    import yaml

    from pipelinewise_spark.plans.vault import decrypt_tree

    # vault-encrypted values ($PWS_VAULT;...) decrypt transparently at
    # compile time, like the reference's ansible-vault import path; a
    # token with no resolvable secret is a hard error
    return compile_dict(decrypt_tree(yaml.safe_load(text), vault_secret))


def compile_yaml_file(path: str, vault_secret: str | None = None) -> PipelineSpec:
    with open(path, encoding="utf-8") as fh:
        return compile_yaml(fh.read(), vault_secret=vault_secret)


def compile_dict(doc: dict[str, Any]) -> PipelineSpec:
    streams: list[StreamSpec] = []
    for schema in doc.get("schemas", []) or []:
        src = schema.get("source_schema", "public")
        tgt = schema.get("target_schema") or src
        for tbl in schema.get("tables", []) or []:
            name = tbl["table_name"]
            transforms = [
                TransformationSpec(
                    field_id=t.get("column") or t["field_id"],
                    type=t["type"],
                    when=t.get("when", []) or [],
                    field_paths=t.get("field_paths", []) or [],
                )
                for t in tbl.get("transformations", []) or []
            ]
            streams.append(
                StreamSpec(
                    tap_stream_id=f"{src}-{name}",
                    table_name=f"{tgt}.{name}" if tgt != src else name,
                    selected_columns=tbl.get("columns"),
                    replication_method=ReplicationMethod(
                        tbl.get("replication_method", "FULL_TABLE")
                    ),
                    replication_key=tbl.get("replication_key"),
                    primary_keys=list(tbl.get("primary_keys", []) or []),
                    transformations=transforms,
                    hard_delete=bool(tbl.get("hard_delete", False)),
                    flattening_max_level=int(
                        tbl.get("data_flattening_max_level", 0)
                    ),
                    # grants resolve against the schema names (reference:
                    # db_sync.py:265-284 keys the per-schema permission
                    # override by the SOURCE schema, grants target-side)
                    options={
                        "target_schema": tgt,
                        "stream_schema_name": src,
                        **dict(tbl.get("options", {}) or {}),
                    },
                )
            )
    return PipelineSpec(
        pipeline_id=doc.get("id", "pipeline"),
        target_path=doc.get("target_path", "."),
        streams=streams,
        state_path=doc.get("state_path"),
        options=dict(doc.get("options", {}) or {}),
    )
