"""Bookmark state store — the engine's ``state.json``.

Mirrors the Singer state contract (bookmarks keyed by tap_stream_id holding
per-method keys such as ``replication_key_value`` / ``version`` / offsets —
/root/reference/pipelinewise/cli/pipelinewise.py:2010-2045). Writes are atomic
(tmp file + rename) like the reference's save_state_file under lock
(/root/reference/pipelinewise/fastsync/commons/utils.py:271-302).

At cluster scale this file lives on shared storage (S3/HDFS); the interface is
intentionally tiny so a different backend (e.g. a Delta table or DynamoDB) can
replace it without touching operators.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
from typing import Any


class BookmarkStore:
    def __init__(self, path: str):
        self.path = path
        self._lock = threading.RLock()  # streams run concurrently in the runner
        self._dirty_updates = 0
        self._last_save = 0.0
        self._state: dict[str, Any] = {"bookmarks": {}}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                loaded = json.load(fh)
            if isinstance(loaded, dict):
                self._state = loaded
                self._state.setdefault("bookmarks", {})

    def get(self, tap_stream_id: str, key: str, default: Any = None) -> Any:
        with self._lock:
            return self._state["bookmarks"].get(tap_stream_id, {}).get(key, default)

    def get_bookmark(self, tap_stream_id: str) -> dict[str, Any]:
        with self._lock:
            return dict(self._state["bookmarks"].get(tap_stream_id, {}))

    def set(self, tap_stream_id: str, key: str, value: Any) -> None:
        with self._lock:
            self._state["bookmarks"].setdefault(tap_stream_id, {})[key] = value
            self._dirty_updates += 1

    def update(self, tap_stream_id: str, values: dict[str, Any]) -> None:
        with self._lock:
            self._state["bookmarks"].setdefault(tap_stream_id, {}).update(values)
            self._dirty_updates += 1

    def save_throttled(
        self, min_interval_s: float = 10.0, max_pending: int = 100
    ) -> bool:
        """Write-throttled save for high-frequency bookmark advances.

        The reference never writes state per record: tap-postgres flushes the
        LSN bookmark every UPDATE_BOOKMARK_PERIOD (10 000) changes
        (logical_replication.py:23,681), tap-kafka commits on
        ``commit_interval_ms`` (sync.py:411). Same contract here: persist
        when ``min_interval_s`` has elapsed since the last write OR
        ``max_pending`` updates have accumulated; otherwise defer (the final
        ``save()`` always flushes). Returns True if a write happened.
        """
        with self._lock:
            if self._dirty_updates == 0:
                return False
            if (
                self._dirty_updates < max_pending
                and time.monotonic() - self._last_save < min_interval_s
            ):
                return False
            self.save()
            return True

    def save(self) -> None:
        with self._lock:
            d = os.path.dirname(os.path.abspath(self.path))
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            try:
                with os.fdopen(fd, "w", encoding="utf-8") as fh:
                    json.dump(
                        self._state, fh, indent=2, sort_keys=True, default=str
                    )
                os.replace(tmp, self.path)
                self._dirty_updates = 0
                self._last_save = time.monotonic()
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)

    def as_dict(self) -> dict[str, Any]:
        return json.loads(json.dumps(self._state, default=str))

    def reset(self, tap_stream_id: str | None = None) -> list[str]:
        """Drop bookmarks (one stream, or ALL when None) and persist — the
        reference's ``reset_state`` verb: the next run re-syncs from
        scratch. Returns the stream ids that were cleared."""
        with self._lock:
            if tap_stream_id is None:
                cleared = sorted(self._state["bookmarks"])
                self._state["bookmarks"] = {}
            else:
                cleared = (
                    [tap_stream_id]
                    if tap_stream_id in self._state["bookmarks"]
                    else []
                )
                self._state["bookmarks"].pop(tap_stream_id, None)
            self._dirty_updates += 1
            self.save()
        return cleared
