from pipelinewise_spark.plans.spec import (  # noqa: F401
    PipelineSpec,
    ReplicationMethod,
    StreamSpec,
)
from pipelinewise_spark.plans.state import BookmarkStore  # noqa: F401
