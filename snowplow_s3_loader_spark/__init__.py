"""snowplow_s3_loader_spark — a PySpark-native analytics engine with the
capabilities of snowplow/snowplow-s3-loader (v3.x, module
snowplow-blob-storage-loader), re-expressed Spark-first.

The reference is a streaming ETL loader: Kinesis records -> parse/classify
(enriched TSV or self-describing JSON) -> group by schema -> size/time
batching -> gzip text objects on S3, with a bad-row dead-letter channel,
metrics and health (reference Processing.scala:69-77).

This package maps that dataflow onto Structured Streaming + DataFrame ops,
and additionally exposes the full relational query surface (joins, windows,
aggregations, set ops) plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) — all stock
PySpark, no custom Catalyst rules (SURVEY.md SS2.3, SS4).
"""

from snowplow_s3_loader_spark.session import get_spark  # noqa: F401
from snowplow_s3_loader_spark.tables import TABLES, load_table, register_tables  # noqa: F401

__version__ = "0.1.0"
