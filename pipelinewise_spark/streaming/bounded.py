"""Bounded stream runs — the reference's run-time limits.

tap-kafka stops on ``max_runtime_ms``/``consumer_timeout_ms``; tap-postgres
CDC on ``max_run_seconds`` / ``logical_poll_total_seconds`` / ``break_at_end_lsn``
(SURVEY §2.5). Spark equivalents:

- drain-everything-then-stop  → ``Trigger.AvailableNow`` (used by cdc.py)
- wall-clock bound            → ``awaitTermination(timeout)`` + graceful stop

Both leave the checkpoint consistent: the next run resumes from the bookmark.
"""

from __future__ import annotations

import json
import os
import time

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


def await_bounded(
    query: StreamingQuery, max_run_seconds: float | None = None
) -> None:
    """Await an availableNow drain with a wall-clock guard.

    Every engine query path that starts a stream awaits it through this
    helper so ONE wedged micro-batch can never stall an entire bench/test
    session (the r13 failure mode: a bare ``awaitTermination()`` has no
    containment). A drain that finishes propagates exceptions exactly like
    the bare call; a drain that exceeds the bound is stopped gracefully
    (checkpoint stays consistent) and raises ``TimeoutError`` so callers
    record an explicit per-query error instead of a silent partial result.

    The default bound comes from ``PWS_STREAM_MAX_RUN_SECONDS`` (600 s —
    generous: every fixture drain in the suite completes in seconds; the
    bound exists for wedges, not pacing)."""
    if max_run_seconds is None:
        try:
            max_run_seconds = float(
                os.environ.get("PWS_STREAM_MAX_RUN_SECONDS", "600")
            )
        except ValueError:
            max_run_seconds = 600.0
    if not run_bounded(query, max_run_seconds):
        raise TimeoutError(
            f"streaming query {query.name or query.id} did not drain "
            f"within {max_run_seconds:.0f}s; stopped gracefully "
            "(checkpoint consistent; raise PWS_STREAM_MAX_RUN_SECONDS "
            "to allow longer drains)"
        )


class StopToken:
    """Cross-process graceful-stop handshake — the reference's ``stop_tap``
    (cli/pipelinewise.py:1319: pidfile + SIGTERM to the tap process)
    re-expressed for Spark, where the runnable is a StreamingQuery inside a
    driver JVM, not a child process to signal.

    The CLI ``stop`` verb drops a token file under the pipeline's target
    path; the running driver polls it between micro-batches (see
    :func:`await_with_stop`) and calls ``StreamingQuery.stop()`` — the
    in-flight batch commits through the checkpoint, so the next run
    resumes exactly at the bookmark. Works across machines when
    target_path is shared storage (the reference explicitly cannot stop
    remotely)."""

    FILENAME = "_stop_token"

    def __init__(self, target_path: str):
        self.path = os.path.join(target_path, self.FILENAME)

    def request(self, reason: str = "cli-stop") -> str:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"reason": reason, "requested_at": time.time()}, fh)
        os.replace(tmp, self.path)  # atomic: readers see whole tokens only
        return self.path

    def requested(self) -> bool:
        return os.path.exists(self.path)

    def clear(self) -> bool:
        try:
            os.remove(self.path)
            return True
        except FileNotFoundError:
            return False


def await_with_stop(
    query: StreamingQuery,
    stop_token: StopToken | None = None,
    max_run_seconds: float | None = None,
    poll_seconds: float = 1.0,
) -> str:
    """Await a streaming query, stopping it GRACEFULLY when the stop token
    appears or the wall-clock bound passes. Returns ``"finished"`` (drained
    on its own), ``"stopped:token"`` or ``"stopped:timeout"``. In every
    case the checkpoint is consistent and a restart resumes from the
    bookmark."""
    t0 = time.monotonic()
    while True:
        if query.awaitTermination(timeout=poll_seconds):
            return "finished"
        if stop_token is not None and stop_token.requested():
            query.stop()
            query.awaitTermination()
            return "stopped:token"
        if (
            max_run_seconds is not None
            and time.monotonic() - t0 >= max_run_seconds
        ):
            query.stop()
            query.awaitTermination()
            return "stopped:timeout"
