"""Shared maintenance lifecycle for persisted index artifacts.

Four index families ship a standing on-disk artifact with the same
operational story — build once, extend per ingest batch, compact when
fragments accumulate, vacuum superseded data, report staleness:

- LSH dedup index        (functions/dedup.py — shingles + bands dirs)
- IVF ANN index          (functions/similarity.py — lists + centroids)
- PQ ANN index           (functions/similarity.py — codes)
- inverted text index    (functions/textindex.py — postings)

Before r9 each family grew its own copy of the versioning plumbing
(dir pointers in a JSON sidecar, extension/compaction counters,
pointer-then-vacuum two-phase cleanup). This module owns that contract
once; the families keep only their kernels (what a fragment contains,
how a compaction rewrite re-clusters).

Mechanics (ManifestTable-lite, for read-mostly serving artifacts):

- metadata lives in one JSON sidecar written through the MetaFS seam
  (pyarrow.fs — works on s3://, hdfs://, local); data dirs are written
  by Spark;
- every data *role* (e.g. ``postings``, ``bands``) resolves through a
  ``{role}_dir`` pointer in the sidecar; compaction writes NEW versioned
  dirs (``{role}-0001``, ...) and atomically repoints, so in-flight
  readers of the old dirs are never disturbed — vacuum deletes
  superseded dirs later;
- counters: ``extensions`` (lifetime), ``extensions_since_compaction``
  (the signal a maintenance loop thresholds on), ``compactions``.

Pre-r9 indexes (unversioned dirs, no counters) load transparently:
missing pointers default to the family's legacy dir names.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Sequence
from typing import Any

from pipelinewise_spark.operators.fsio import MetaFS


class IndexLifecycle:
    """One persisted index's maintenance state: MetaFS root + sidecar."""

    def __init__(self, mfs: MetaFS, meta_file: str, meta: dict[str, Any],
                 roles: Sequence[str]):
        self.mfs = mfs
        self.meta_file = meta_file
        self.meta = meta
        self.roles = tuple(roles)

    # ------------------------------------------------------------ create
    @classmethod
    def create(
        cls,
        path: str,
        meta_file: str,
        roles: Sequence[str],
        params: dict[str, Any],
    ) -> "IndexLifecycle":
        """Fresh index: version-0 dir per role, zeroed counters, family
        params merged into the sidecar. The caller writes the data into
        ``uri(role)`` and then calls :meth:`save`."""
        mfs = MetaFS(path)
        meta: dict[str, Any] = dict(params)
        for r in roles:
            meta[f"{r}_dir"] = f"{r}-0000"
        meta.setdefault("extensions", 0)
        meta.setdefault("extensions_since_compaction", 0)
        meta.setdefault("compactions", 0)
        return cls(mfs, meta_file, meta, roles)

    @classmethod
    def load(
        cls,
        path: str,
        meta_file: str,
        roles: Sequence[str],
    ) -> "IndexLifecycle":
        """Open an existing index. Pre-lifecycle sidecars (no ``_dir``
        pointers / counters) default to the legacy unversioned layout —
        ``{role}_dir = {role}`` — so old artifacts keep serving."""
        mfs = MetaFS(path)
        meta = json.loads(mfs.read_text(meta_file))
        for r in roles:
            meta.setdefault(f"{r}_dir", r)
        meta.setdefault("extensions", 0)
        meta.setdefault("extensions_since_compaction", 0)
        meta.setdefault("compactions", 0)
        return cls(mfs, meta_file, meta, roles)

    # ------------------------------------------------------------- paths
    def dir(self, role: str) -> str:
        return self.meta[f"{role}_dir"]

    def uri(self, role: str) -> str:
        """Spark-visible URI of a role's CURRENT data dir."""
        return self.mfs.uri(self.dir(role))

    # ------------------------------------------------------------- verbs
    def save(self) -> None:
        self.mfs.write_text(json.dumps(self.meta), self.meta_file,
                            atomic=True)

    def record_extension(self) -> None:
        """Bump the fragment-pressure counters after an extend appended
        its batch fragments; persists the sidecar."""
        self.meta["extensions"] = self.meta.get("extensions", 0) + 1
        self.meta["extensions_since_compaction"] = (
            self.meta.get("extensions_since_compaction", 0) + 1
        )
        self.save()

    def compact(
        self, rewriters: dict[str, Callable[[str, str], None]]
    ) -> dict[str, Any]:
        """Two-phase compaction: for each role in ``rewriters``, call
        ``rewriter(current_uri, new_uri)`` to rewrite that role's data
        into a fresh versioned dir, then atomically repoint the sidecar
        and reset the staleness counter. Roles absent from ``rewriters``
        (build-once sidecars like IVF centroids) keep their dir. Old dirs
        stay on disk for in-flight readers until :meth:`vacuum`."""
        n = self.meta.get("compactions", 0) + 1
        new_dirs = {r: f"{r}-{n:04d}" for r in rewriters}
        for r, rw in rewriters.items():
            rw(self.uri(r), self.mfs.uri(new_dirs[r]))
        for r, d in new_dirs.items():
            self.meta[f"{r}_dir"] = d
        self.meta["compactions"] = n
        self.meta["extensions_since_compaction"] = 0
        self.save()
        return self.meta

    def vacuum(self) -> list[str]:
        """Delete data dirs no longer referenced by any role pointer
        (ManifestTable.vacuum analog). Only dirs matching a role's naming
        scheme — ``{role}`` or ``{role}-NNNN`` — are candidates; returns
        the removed names."""
        live = {self.dir(r) for r in self.roles}
        pats = [re.compile(rf"{re.escape(r)}(-\d+)?$") for r in self.roles]
        removed = []
        for d in self.mfs.listdir():
            if d not in live and any(p.fullmatch(d) for p in pats):
                self.mfs.delete_dir(d)
                removed.append(d)
        return removed

    def status(self, fragment_role: str | None = None) -> dict[str, Any]:
        """Staleness/maintenance surface (metadata-only): the counters
        plus, when ``fragment_role`` is given, the live fragment-file
        count for that role (each extend adds ~1 file per touched
        partition — the number a maintenance loop thresholds on)."""
        out: dict[str, Any] = {
            "extensions": self.meta.get("extensions", 0),
            "extensions_since_compaction": self.meta.get(
                "extensions_since_compaction", 0
            ),
            "compactions": self.meta.get("compactions", 0),
        }
        for r in self.roles:
            out[f"{r}_dir"] = self.dir(r)
        if fragment_role is not None:
            out["fragment_files"] = sum(
                1
                for rel in self.mfs.walk_files(self.dir(fragment_role))
                if rel.endswith(".parquet")
            )
        return out
