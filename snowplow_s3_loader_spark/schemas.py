"""Spark StructTypes for the engine's record types (SURVEY.md SS1.5).

- schema_key: parsed iglu URI 5-tuple (reference DynamicPath.scala:24-30)
- bad_row: dead-letter envelope (snowplow-badrows GenericError /
  LoaderParsingError / SizeViolation as used at Processing.scala:156-204,
  BadRowsSerializer.scala:24-44)
- atomic enriched event: 131 positional TSV fields (public Snowplow atomic
  schema; the loader itself only interprets index 3, collector_tstamp —
  Processing.scala:143-154). All fields land as strings; typed projections
  are applied on demand, never round-tripping the raw line (byte-identical
  passthrough contract, ProcessingSpec.scala:71,98).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA_KEY_TYPE = StructType(
    [
        StructField("vendor", StringType()),
        StructField("name", StringType()),
        StructField("format", StringType()),
        StructField("model", IntegerType()),
        StructField("revision", IntegerType()),
        StructField("addition", IntegerType()),
    ]
)

PROCESSOR_TYPE = StructType(
    [
        StructField("artifact", StringType()),
        StructField("version", StringType()),
    ]
)

# Failure.GenericFailure of the badrows library (generic_error/1-0-0).
FAILURE_TYPE = StructType(
    [
        StructField("timestamp", TimestampType()),
        StructField("errors", ArrayType(StringType())),
    ]
)

# Self-describing badrows envelope: {"schema": "iglu:...badrows/<type>/...",
# "data": {processor, failure, payload}} — see badrows.py for the per-type
# failure shapes (generic_error, loader_parsing_error, size_violation).
BAD_ROW_TYPE = StructType(
    [
        StructField("schema", StringType()),
        StructField(
            "data",
            StructType(
                [
                    StructField("processor", PROCESSOR_TYPE),
                    StructField("failure", FAILURE_TYPE),
                    # base64 raw bytes for generic_error (Processing.scala:198)
                    StructField("payload", StringType()),
                ]
            ),
        ),
    ]
)

# First 8 of the 131 atomic columns carry the names the loader/tests touch
# (FIXTURES.md F1); the rest are passthrough positional fields.
_ATOMIC_NAMED = [
    "app_id",
    "platform",
    "etl_tstamp",
    "collector_tstamp",
    "dvce_created_tstamp",
    "event",
    "event_id",
    "txn_id",
]
ATOMIC_FIELD_COUNT = 131
ATOMIC_COLUMNS = _ATOMIC_NAMED + [f"field_{i}" for i in range(len(_ATOMIC_NAMED), ATOMIC_FIELD_COUNT)]

ATOMIC_TSV_SCHEMA = StructType([StructField(c, StringType()) for c in ATOMIC_COLUMNS])
