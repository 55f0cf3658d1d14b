"""Pipeline specification — the engine's equivalent of pipelinewise YAML.

The reference compiles YAML project files into per-connector JSON configs and
a Singer catalog with selection/replication metadata
(/root/reference/pipelinewise/cli/config.py:30-125, 258-302;
 catalog metadata pipelinewise.py:214-243). Here the same information is a
plain dataclass tree: a PipelineSpec holds StreamSpecs; a StreamSpec names the
source table, selected columns, replication method + key, primary keys, and
masking transformations. The compiler stage of the reference (``import``)
reduces to constructing these objects (optionally from YAML/JSON dicts).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class ReplicationMethod(str, Enum):
    # /root/reference/pipelinewise/cli/pipelinewise.py:72-74
    FULL_TABLE = "FULL_TABLE"
    INCREMENTAL = "INCREMENTAL"
    LOG_BASED = "LOG_BASED"


@dataclass
class TransformationSpec:
    """One masking transformation (reference transformation.json entry:
    /root/reference/pipelinewise/cli/config.py:352-382)."""

    field_id: str
    type: str  # SET-NULL | HASH | HASH-SKIP-FIRST-n | MASK-DATE | ...
    when: list[dict[str, Any]] = field(default_factory=list)
    field_paths: list[str] = field(default_factory=list)  # paths inside a JSON column


@dataclass
class StreamSpec:
    """One stream = one source table/collection/topic = one DataFrame."""

    tap_stream_id: str
    table_name: str | None = None  # target table name; defaults to tap_stream_id
    selected_columns: list[str] | None = None  # None = all
    replication_method: ReplicationMethod = ReplicationMethod.FULL_TABLE
    replication_key: str | None = None
    primary_keys: list[str] = field(default_factory=list)
    transformations: list[TransformationSpec] = field(default_factory=list)
    # target behaviors (reference target config knobs)
    hard_delete: bool = False
    add_metadata_columns: bool = True
    flattening_max_level: int = 0
    options: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # accept plain strings for ergonomic construction
        if not isinstance(self.replication_method, ReplicationMethod):
            self.replication_method = ReplicationMethod(self.replication_method)

    @property
    def target_table(self) -> str:
        return self.table_name or self.tap_stream_id

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "StreamSpec":
        transforms = [
            TransformationSpec(
                field_id=t["field_id"],
                type=t["type"],
                when=t.get("when", []) or [],
                field_paths=t.get("field_paths", []) or [],
            )
            for t in d.get("transformations", []) or []
        ]
        return cls(
            tap_stream_id=d["tap_stream_id"],
            table_name=d.get("table_name"),
            selected_columns=d.get("selected_columns"),
            replication_method=ReplicationMethod(
                d.get("replication_method", "FULL_TABLE")
            ),
            replication_key=d.get("replication_key"),
            primary_keys=list(d.get("primary_keys", []) or []),
            transformations=transforms,
            hard_delete=bool(d.get("hard_delete", False)),
            add_metadata_columns=bool(d.get("add_metadata_columns", True)),
            flattening_max_level=int(d.get("flattening_max_level", 0)),
            options=dict(d.get("options", {}) or {}),
        )


@dataclass
class PipelineSpec:
    """A tap→target pipeline: several streams into one target location."""

    pipeline_id: str
    target_path: str  # lakehouse root; tables live at <target_path>/<table>
    streams: list[StreamSpec] = field(default_factory=list)
    state_path: str | None = None  # bookmark store; default <target_path>/_state.json
    options: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineSpec":
        return cls(
            pipeline_id=d["pipeline_id"],
            target_path=d["target_path"],
            streams=[StreamSpec.from_dict(s) for s in d.get("streams", [])],
            state_path=d.get("state_path"),
            options=dict(d.get("options", {}) or {}),
        )

    @classmethod
    def from_json_file(cls, path: str) -> "PipelineSpec":
        with open(path, encoding="utf-8") as fh:
            return cls.from_dict(json.load(fh))

    def stream(self, tap_stream_id: str) -> StreamSpec:
        for s in self.streams:
            if s.tap_stream_id == tap_stream_id:
                return s
        raise KeyError(tap_stream_id)
