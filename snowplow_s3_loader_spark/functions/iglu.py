"""Iglu URI / self-describing-JSON column expressions (reference
Processing.scala:175-187 — JSON parse + SchemaKey extraction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.igluschema import IGLU_URI_REGEXP


def sdj_schema_uri(value: Column) -> Column:
    """Extract the `schema` field from a self-describing JSON line.

    NULL when the line is not valid JSON or has no `schema` field — the two
    bad-row conditions of Processing.scala:181-187 collapse into NULL here
    and are told apart by `try_parse_json` nullness where needed.
    """
    return F.get_json_object(value, "$.schema")


def is_valid_iglu_uri(uri: Column) -> Column:
    return uri.rlike(IGLU_URI_REGEXP)


def iglu_schema_key(uri: Column) -> Column:
    """Parse an iglu URI into the schema_key struct; NULL if malformed."""
    parsed = F.struct(
        F.regexp_extract(uri, IGLU_URI_REGEXP, 1).alias("vendor"),
        F.regexp_extract(uri, IGLU_URI_REGEXP, 2).alias("name"),
        F.regexp_extract(uri, IGLU_URI_REGEXP, 3).alias("format"),
        F.regexp_extract(uri, IGLU_URI_REGEXP, 4).cast("int").alias("model"),
        F.regexp_extract(uri, IGLU_URI_REGEXP, 5).cast("int").alias("revision"),
        F.regexp_extract(uri, IGLU_URI_REGEXP, 6).cast("int").alias("addition"),
    )
    return F.when(is_valid_iglu_uri(uri), parsed)
