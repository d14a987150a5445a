"""Stream sources (O1): file-stream for tests/local, Kinesis for prod
(option passthrough, connector-gated), rate for soak tests."""

from snowplow_s3_loader_spark.sources.streams import (  # noqa: F401
    binary_file_stream,
    file_stream,
    kinesis_stream,
    rate_stream,
)
