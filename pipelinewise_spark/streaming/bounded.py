"""Bounded stream runs — the reference's run-time limits.

tap-kafka stops on ``max_runtime_ms``/``consumer_timeout_ms``; tap-postgres
CDC on ``max_run_seconds`` / ``logical_poll_total_seconds`` / ``break_at_end_lsn``
(SURVEY §2.5). Spark equivalents:

- drain-everything-then-stop  → ``Trigger.AvailableNow`` (used by cdc.py)
- wall-clock bound            → ``awaitTermination(timeout)`` + graceful stop

Both leave the checkpoint consistent: the next run resumes from the bookmark.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def run_bounded(query: StreamingQuery, max_run_seconds: float) -> bool:
    """Let a continuous stream run for at most ``max_run_seconds``, then stop
    it gracefully. Returns True if it terminated on its own (AvailableNow
    drained), False if the time bound stopped it."""
    finished = query.awaitTermination(timeout=max_run_seconds)
    if not finished:
        query.stop()
        query.awaitTermination()
    return bool(finished)
