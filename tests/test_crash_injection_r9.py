"""Crash-atomicity for the ManifestTable commit protocol (r8 VERDICT
task 4): simulate writer DEATH — not just a lost race — at every point
inside the critical section and assert the three invariants the
reference's interrupted `ALTER TABLE ... SWAP WITH` would also need
(fastsync/commons/target_snowflake.py:448-469):

  I1. readers never see a torn table: after any crash the pointer
      resolves to a fully-written manifest and read() returns exactly
      the last COMMITTED rows;
  I2. an abandoned manifest never becomes head;
  I3. a later writer completes: the crash leaves no permanent wedge
      (a dead holder's lock is broken by age; orphan manifests only
      burn a version number).

Writer death is an injected exception at a kill point — for on-disk
state that is indistinguishable from a killed process (nothing in the
protocol runs `finally`-style repair other than the lock release, which
we suppress too for the points where the dying writer held it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pipelinewise_spark.operators.manifest_table import ManifestTable


class WriterDied(RuntimeError):
    pass


def _mk(spark, tmp_path, rows=3):
    root = str(tmp_path / "t")
    t = ManifestTable(root, [])
    t.overwrite(spark.range(rows).select(F.col("id").alias("k")))
    return root, t


def _assert_not_torn(spark, root, expect_rows):
    """I1 + I2: pointer resolves, manifest parses, rows are the last
    committed state."""
    t = ManifestTable(root, [])
    head = t.current_manifest_name()
    assert head is not None
    m = t._load_manifest()  # raises if the head manifest is torn/missing
    assert isinstance(m.get("files", m.get("entries", [])), list)
    assert t.read(spark).count() == expect_rows


def _assert_recovers(spark, root, expect_after):
    """I3: a fresh writer (short lock timeout so a dead holder's lock
    breaks quickly) commits; readers see its rows."""
    t = ManifestTable(root, [])
    orig = t._commit_lock

    def quick_lock(timeout: float = 0.2):
        return orig(timeout=timeout)

    t._commit_lock = quick_lock
    t.append(spark.range(100, 102).select(F.col("id").alias("k")))
    assert ManifestTable(root, []).read(spark).count() == expect_after


# Kill points, each a predicate over MetaFS verbs observed during the
# doomed append. `fires_holding_lock` marks points where the dying
# writer holds _commit.lock (so recovery must break it by age).
def _kill_after_manifest_write(calls, verb, rel):
    # after the create-exclusive manifest write, before the pointer swap
    return verb == "write_text_exclusive" and rel.startswith("manifest-")


def _kill_after_lock_acquire(calls, verb, rel):
    # lock acquired, manifest never written
    return verb == "write_text_exclusive" and rel == "_commit.lock"


def _kill_after_stale_lock_delete(calls, verb, rel):
    # during a broken-lock takeover: breaker deletes the stale lock and
    # dies before writing its own (no lock on disk at all)
    return verb == "delete" and rel == "_commit.lock"


@pytest.mark.parametrize(
    "kill_when, holds_lock",
    [
        (_kill_after_manifest_write, True),
        (_kill_after_lock_acquire, True),
    ],
    ids=["post-manifest-pre-swap", "post-lock-pre-manifest"],
)
def test_writer_death_inside_critical_section(
    spark, tmp_path, kill_when, holds_lock
):
    root, t = _mk(spark, tmp_path)
    head0 = t.current_manifest_name()
    versions0 = t.versions()

    a = ManifestTable(root, [])
    mfs = a.mfs
    real_excl = mfs.write_text_exclusive
    real_write = mfs.write_text
    real_delete = mfs.delete
    calls: list[tuple[str, str]] = []

    def make(verb, real):
        def wrapper(*args, **kw):
            # write_text_exclusive(data, *rel) vs write_text(data, *rel)
            # vs delete(*rel)
            rel = args[1] if verb != "delete" else args[0]
            out = real(*args, **kw)
            calls.append((verb, rel))
            if kill_when(calls, verb, rel):
                raise WriterDied(f"killed after {verb} {rel}")
            return out

        return wrapper

    mfs.write_text_exclusive = make("write_text_exclusive", real_excl)
    mfs.write_text = make("write_text", real_write)
    mfs.delete = make("delete", real_delete)

    with pytest.raises(WriterDied):
        a.append(spark.range(10, 13).select(F.col("id").alias("k")))
    # simulate real death: the context manager's ownership-checked lock
    # release ran in `finally` — a killed process would NOT have run it.
    # Re-create the abandoned lock if the release removed it.
    if holds_lock and not mfs.exists("_commit.lock"):
        real_write("0|dead-writer-token", "_commit.lock")

    # I1/I2: pre-crash state intact, orphan manifest is not head
    _assert_not_torn(spark, root, expect_rows=3)
    t2 = ManifestTable(root, [])
    assert t2.current_manifest_name() == head0
    # the doomed append may have allocated a manifest — it must be an
    # ORPHAN (> head0's number, unreferenced), never the pointer
    extra = set(t2.versions()) - set(versions0)
    for v in extra:
        assert f"manifest-{v:08d}.json" != t2.current_manifest_name()

    # I3: a later writer breaks the dead holder's lock by age and lands
    _assert_recovers(spark, root, expect_after=5)


def test_breaker_death_after_stale_lock_delete(spark, tmp_path):
    """A writer that times out a stale lock, deletes it, and dies before
    re-contending leaves NO lock on disk — the next writer must acquire
    immediately and commit; the table is never torn."""
    root, t = _mk(spark, tmp_path)
    head0 = t.current_manifest_name()

    # plant an abandoned stale lock (born at epoch 0 → instantly stale)
    t.mfs.write_text("0|dead-holder", "_commit.lock")

    a = ManifestTable(root, [])
    real_delete = a.mfs.delete

    def dying_delete(*rel):
        real_delete(*rel)
        if rel and rel[0] == "_commit.lock":
            raise WriterDied("breaker died after deleting stale lock")

    a.mfs.delete = dying_delete
    with pytest.raises(WriterDied):
        a.append(spark.range(10, 12).select(F.col("id").alias("k")))

    assert not t.mfs.exists("_commit.lock")
    _assert_not_torn(spark, root, expect_rows=3)
    assert ManifestTable(root, []).current_manifest_name() == head0
    _assert_recovers(spark, root, expect_after=5)


def test_orphan_manifest_burns_version_but_never_resurrects(
    spark, tmp_path
):
    """After a post-manifest-pre-swap death, subsequent commits allocate
    PAST the orphan (versions() scan) — the orphan's number is burned and
    its contents are never served by read() at any version the pointer
    ever referenced; time travel to the orphan version itself surfaces
    the uncommitted data only under the explicit version= escape hatch,
    never via the head pointer."""
    root, t = _mk(spark, tmp_path)

    a = ManifestTable(root, [])
    real_excl = a.mfs.write_text_exclusive

    def die_after_manifest(data, *rel):
        real_excl(data, *rel)
        if rel and rel[0].startswith("manifest-"):
            raise WriterDied("post-manifest death")

    a.mfs.write_text_exclusive = die_after_manifest
    with pytest.raises(WriterDied):
        a.append(spark.range(50, 60).select(F.col("id").alias("k")))
    if not a.mfs.exists("_commit.lock"):
        a.mfs.write_text("0|dead", "_commit.lock")

    orphan = max(ManifestTable(root, []).versions())

    # recovery writer: next commit must allocate orphan+1, head skips over
    b = ManifestTable(root, [])
    orig = b._commit_lock
    b._commit_lock = lambda timeout=0.2: orig(timeout=timeout)
    b.append(spark.range(7, 9).select(F.col("id").alias("k")))
    head = ManifestTable(root, []).current_manifest_name()
    assert head == f"manifest-{orphan + 1:08d}.json"
    assert ManifestTable(root, []).read(spark).count() == 5  # 3 + 2, not 13
