"""Fixture-time attribution for benchmarked queries.

Several registered queries build their own input fixtures inside the query
function (write a source parquet for a stream, build a two-version
ManifestTable, roundtrip through ORC) because the operator under test
consumes a *stateful* input the shared sf-dir parquet cannot provide. That
is honest end-to-end timing, but it makes the bench number
fixture-plus-operator and regressions hard to attribute.

Query functions wrap their fixture-build region in ``fixture_timer()``;
bench.py drains the accumulator after each query and reports ``fixture_s``
next to the total so ``operator_s = total - fixture_s`` is computable at a
glance. The driver's correctness path ignores the accumulator entirely.
"""

from __future__ import annotations

import contextlib
import time

_ACC = 0.0


@contextlib.contextmanager
def fixture_timer():
    """Time a fixture-build region; accumulates into the module counter."""
    global _ACC
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _ACC += time.perf_counter() - t0


def drain() -> float:
    """Return seconds accumulated since the last drain, and reset."""
    global _ACC
    v, _ACC = _ACC, 0.0
    return v
