"""Post-load grants / ACL hooks.

Reference behavior: after each load the target grants USAGE on the schema
and SELECT on the table(s) to configured roles —
``target_snowflake/db_sync.py:609-637`` (grant_usage_on_schema /
grant_select_on_table), ``fastsync/commons/target_snowflake.py:354-390``
(the same statements on the FastSync path), with role lists resolved by a
two-level config precedence: ``default_target_schema_select_permissions``
globally, overridden per-schema by ``target_schema_select_permissions``
(``db_sync.py:265-284``).

In a lakehouse there is no ``GRANT`` DDL to run — access control lives in
the catalog / table metadata and engines enforce it at read time. The
Spark-native hook therefore (1) resolves the same config precedence, (2)
records the ACL in an ``_acl.json`` next to the table (MetaFS: works on
local FS and object stores, atomic pointer write), and (3) returns the
equivalent statements for an external catalog hook to execute — so a
deployment with a real Unity/Hive/Ranger catalog plugs its executor into
``apply_grants(..., execute=fn)`` and gets byte-identical statements to
the reference's.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence
from typing import Any

from pipelinewise_spark.identifiers import quote_identifier
from pipelinewise_spark.operators.fsio import MetaFS

_ACL_FILE = "_acl.json"


def resolve_grantees(
    connection_config: dict[str, Any], stream_schema_name: str | None = None
) -> list[str]:
    """The reference's two-level grantee precedence (db_sync.py:265-284,
    fastsync/commons/utils.py:get_grantees): when the stream's schema IS in
    ``schema_mapping``, the mapping entry wins outright — an entry WITHOUT
    ``target_schema_select_permissions`` grants NOTHING (least privilege;
    never falls back to the global default). Only schemas absent from the
    mapping use ``default_target_schema_select_permissions``. Either may be
    a single role or a list."""
    mapping = connection_config.get("schema_mapping") or {}
    if stream_schema_name and stream_schema_name in mapping:
        grantees = mapping[stream_schema_name].get(
            "target_schema_select_permissions", []
        )
    else:
        grantees = connection_config.get(
            "default_target_schema_select_permissions"
        )
    if grantees is None:
        return []
    if isinstance(grantees, str):
        return [grantees]
    return list(grantees)


def grant_statements(
    schema_name: str, table_name: str, grantees: Sequence[str]
) -> list[str]:
    """The statements the reference runs post-load, one USAGE per schema
    grantee plus one SELECT per table grantee (db_sync.py:609-637)."""
    out = []
    for role in grantees:
        r = quote_identifier(role)
        out.append(
            f"GRANT USAGE ON SCHEMA {quote_identifier(schema_name)} "
            f"TO ROLE {r}"
        )
        out.append(
            f"GRANT SELECT ON {quote_identifier(schema_name)}."
            f"{quote_identifier(table_name)} TO ROLE {r}"
        )
    return out


def apply_grants(
    table_root: str,
    schema_name: str,
    table_name: str,
    connection_config: dict[str, Any],
    stream_schema_name: str | None = None,
    execute: Callable[[str], None] | None = None,
) -> list[str]:
    """Post-load grant hook: resolve grantees, persist the ACL beside the
    table (read-time enforcement metadata), optionally push each statement
    through ``execute`` (an external catalog hook). Idempotent — re-running
    after every load, as the reference does, converges to the same ACL.
    Returns the statements (empty list = no grants configured, a no-op
    exactly like the reference when no permissions key is set)."""
    grantees = resolve_grantees(connection_config, stream_schema_name)
    if not grantees:
        return []
    stmts = grant_statements(schema_name, table_name, grantees)
    acl = {
        "schema": schema_name,
        "table": table_name,
        "select": sorted(set(grantees)),
        "statements": stmts,
    }
    MetaFS(table_root).write_text(
        json.dumps(acl, indent=1), _ACL_FILE, atomic=True
    )
    if execute is not None:
        for s in stmts:
            execute(s)
    return stmts


def read_acl(table_root: str) -> dict[str, Any] | None:
    fs = MetaFS(table_root)
    if not fs.exists(_ACL_FILE):
        return None
    return json.loads(fs.read_text(_ACL_FILE))
