"""Bad-row envelope + size cap tests (BadRowsSerializer.scala:24-44,
FIXTURES.md F4)."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.badrows import build_bad_rows, PROCESSOR_NAME
from snowplow_s3_loader_spark.operators.parse import PURPOSE_SDJ, classify

TS = "2023-12-25 15:30:45"


def _bad_df(spark, lines):
    df = classify(spark.createDataFrame([(l,) for l in lines], "value string"), PURPOSE_SDJ)
    return df


def test_generic_error_envelope(spark):
    from snowplow_s3_loader_spark.badrows import SCHEMA_GENERIC_ERROR

    line = '{"data": {"field": "value"}}'
    out = build_bad_rows(_bad_df(spark, [line]), F.lit(TS).cast("timestamp")).collect()
    assert len(out) == 1
    env = json.loads(out[0]["bad_row_json"])
    assert env["schema"] == SCHEMA_GENERIC_ERROR
    data = env["data"]
    assert data["processor"]["artifact"] == PROCESSOR_NAME
    assert "Can't extract schema" in data["failure"]["errors"][0]
    assert data["failure"]["timestamp"] == "2023-12-25T15:30:45.000Z"
    assert base64.b64decode(data["payload"]).decode() == line


def test_size_violation_trim(spark):
    from snowplow_s3_loader_spark.badrows import (
        SCHEMA_SIZE_VIOLATION,
        SIZE_VIOLATION_EXPECTATION,
    )

    line = json.dumps({"data": {"blob": "x" * 500}})  # serialized bad row > 100 B
    out = build_bad_rows(
        _bad_df(spark, [line]), F.lit(TS).cast("timestamp"), max_record_size=100
    ).collect()
    env = json.loads(out[0]["bad_row_json"])
    assert env["schema"] == SCHEMA_SIZE_VIOLATION
    data = env["data"]
    assert data["failure"]["maximumAllowedSizeBytes"] == 100
    # actualSizeBytes records the untrimmed serialization size
    # (BadRowsSerializer.scala:30-37)
    assert data["failure"]["actualSizeBytes"] > 100
    assert data["failure"]["expectation"] == SIZE_VIOLATION_EXPECTATION
    # payload trimmed to maxSize/10 chars (BadRowsSerializer.scala:33)
    assert len(data["payload"]) == 10


def test_good_rows_not_emitted(spark):
    line = '{"schema": "iglu:com.example/e/jsonschema/1-0-0", "data": {}}'
    out = build_bad_rows(_bad_df(spark, [line]), F.lit(TS).cast("timestamp")).collect()
    assert out == []


def test_timestamp_is_utc_instant_under_non_utc_session(spark):
    """ADVICE r2: the serialized failure.timestamp must name the real
    instant in UTC (circe Instant parity) even when the session timezone
    is not UTC."""
    import datetime as dt

    import pyspark.sql.functions as F

    instant = dt.datetime(2023, 12, 25, 15, 30, 45, 123000, tzinfo=dt.timezone.utc)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = build_bad_rows(
            _bad_df(spark, ['{"no":"schema"}']), F.lit(instant)
        ).collect()
        data = json.loads(out[0]["bad_row_json"])["data"]
        assert data["failure"]["timestamp"] == "2023-12-25T15:30:45.123Z"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
