"""Source adapter tests: file-stream contract, kinesis connector gate,
rate-source synthesis."""

from __future__ import annotations

import pytest

from snowplow_s3_loader_spark.config import InputConfig
from snowplow_s3_loader_spark.sources.streams import file_stream, kinesis_stream, rate_stream


def test_file_stream_payload_contract(spark, tmp_path):
    (tmp_path / "a.txt").write_text("line1\nline2\n")
    df = file_stream(spark, str(tmp_path))
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["payload"]
    assert df.schema["payload"].dataType.simpleString() == "binary"


def test_kinesis_gate_raises_without_connector(spark):
    cfg = InputConfig(kind="kinesis", stream_name="s", region="us-east-1")
    with pytest.raises(NotImplementedError, match="kinesis source requires"):
        kinesis_stream(spark, cfg)


def test_rate_stream_synthesizes_sdj(spark):
    df = rate_stream(spark, rows_per_second=10)
    assert df.isStreaming
    assert df.schema["payload"].dataType.simpleString() == "binary"
