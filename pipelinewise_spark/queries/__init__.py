"""Named query registry — the driver-facing correctness surface.

Each entry pairs a Spark implementation (``QUERIES[name](spark, sf_dir) →
DataFrame``) with a DuckDB-executable oracle (``ORACLES[name]``) computing the
same result on the same parquet tables. Queries with no SQL-expressible oracle
(streaming, stateful) register with ``oracle=None`` and get a rows-only check.
"""

from pipelinewise_spark.queries.registry import ORACLES, QUERIES, register  # noqa: F401

# import for side effect: populates the registry
from pipelinewise_spark.queries import pipeline as _pipeline  # noqa: F401,E402
from pipelinewise_spark.queries import analytics as _analytics  # noqa: F401,E402
from pipelinewise_spark.queries import targets as _targets  # noqa: F401,E402
from pipelinewise_spark.queries import llmdata as _llmdata  # noqa: F401,E402
from pipelinewise_spark.queries import streaming as _streaming  # noqa: F401,E402
from pipelinewise_spark.queries import ops as _ops  # noqa: F401,E402
