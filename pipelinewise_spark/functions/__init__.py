from pipelinewise_spark.functions.masking import (  # noqa: F401
    apply_transformations,
    compile_mask,
)
