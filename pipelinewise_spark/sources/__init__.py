from pipelinewise_spark.sources.files import FileSource, read_table  # noqa: F401
