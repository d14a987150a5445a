"""Bad-row envelope construction + size cap — O12 of the reference
(Processing.scala:189-204, 315-331; BadRowsSerializer.scala:24-44).

Column-expression implementation: build the GenericError JSON with to_json,
then apply the size-violation rule — a serialized bad row whose byte length
is >= maxRecordSize is replaced by a SizeViolation wrapper whose payload is
trimmed to maxRecordSize/10 characters (BadRowsSerializer.scala:33).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROCESSOR_NAME = "snowplow-s3-loader-spark"
PROCESSOR_VERSION = "0.1.0"


def _processor() -> Column:
    return F.struct(
        F.lit(PROCESSOR_NAME).alias("name"),
        F.lit(PROCESSOR_VERSION).alias("version"),
    )


def generic_error(value: Column, message: Column, timestamp: Column) -> Column:
    """BadRow.GenericError struct: processor, failure{timestamp, messages},
    base64 raw payload (Processing.scala:189-204)."""
    return F.struct(
        F.lit("GenericError").alias("kind"),
        _processor().alias("processor"),
        F.struct(
            timestamp.alias("timestamp"),
            F.array(message).alias("messages"),
        ).alias("failure"),
        F.base64(value.cast("binary")).alias("payload"),
    )


def loader_parsing_error(value: Column, message: Column, timestamp: Column) -> Column:
    """BadRow.LoaderParsingError — decompression failures
    (Processing.scala:156-165)."""
    return F.struct(
        F.lit("LoaderParsingError").alias("kind"),
        _processor().alias("processor"),
        F.struct(timestamp.alias("timestamp"), F.array(message).alias("messages")).alias("failure"),
        F.base64(value.cast("binary")).alias("payload"),
    )


def serialize_with_max_size(bad_row: Column, timestamp: Column, max_record_size: int) -> Column:
    """Serialized bad row, size-capped (BadRowsSerializer.scala:24-44).

    If the JSON serialization is >= max_record_size bytes, emit a
    SizeViolation envelope instead, with the original serialization trimmed
    to max_record_size/10 characters.
    """
    serialized = F.to_json(bad_row)
    trimmed = F.substring(serialized, 1, max_record_size // 10)
    size_violation = F.to_json(
        F.struct(
            F.lit("SizeViolation").alias("kind"),
            _processor().alias("processor"),
            F.struct(
                timestamp.alias("timestamp"),
                F.lit(max_record_size).alias("maximumAllowedSizeBytes"),
                F.lit("Event failed due to its size").alias("expectation"),
            ).alias("failure"),
            trimmed.alias("payload"),
        )
    )
    return F.when(
        F.octet_length(serialized) >= F.lit(max_record_size), size_violation
    ).otherwise(serialized)


def build_bad_rows(
    classified: DataFrame,
    timestamp: Column,
    max_record_size: int = 6_900_000,
    value_col: str = "value",
) -> DataFrame:
    """From classified rows (bad_message != NULL) to serialized bad-row lines.

    max_record_size default mirrors the reference's Kinesis output cap
    (config.aws.reference.hocon `output.bad.maxRecordSize` ~ 6900000).
    """
    bad = classified.filter(F.col("bad_message").isNotNull())
    envelope = generic_error(F.col(value_col), F.col("bad_message"), timestamp)
    return bad.select(
        serialize_with_max_size(envelope, timestamp, max_record_size).alias("bad_row_json")
    )
