"""Structured Streaming sources behind the loader's source abstraction
(reference: common-streams Kinesis factory, AwsApp.scala:19-23).

All sources normalize to a DataFrame with a binary `payload` column — the
reference's record unit (ByteBuffer, SURVEY.md SS1.1) — before the
decompression/classify stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.config import InputConfig


def file_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Line-file source: each line is one record (README.md:11-12 'new lines
    are used to separate records'). Test/local stand-in for Kinesis, same
    downstream contract."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    return df.select(F.col("value").cast("binary").alias("payload"))


def binary_file_stream(spark: SparkSession, path: str, glob: str = "*.bin") -> DataFrame:
    """Whole-file binary source: one file = one source record (the envelope
    case — a single Kinesis record holding a zstd/gzip envelope maps to one
    .bin file here; the decompression stage then expands it, O1)."""
    df = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(F.col("content").alias("payload"))


def kinesis_stream(
    spark: SparkSession, cfg: InputConfig, client_factory: str | None = None
) -> DataFrame:
    """Kinesis source (option surface mirrors config.aws.reference.hocon:7-64).

    Primary path: the built-in Python data source (`kinesis_py`,
    sources/kinesis_source.py) — a boto3 polling reader mirroring the
    reference's single-KCL-worker consumption model, no connector jar
    needed. `client_factory` ("module:callable") injects the wire client;
    default is boto3 (env-gated). For massively-sharded streams prefer
    `kinesis_connector_stream` with a JVM connector jar on the classpath."""
    from snowplow_s3_loader_spark.sources.kinesis_source import (
        KinesisPythonDataSource,
    )

    spark.dataSource.register(KinesisPythonDataSource)
    reader = (
        spark.readStream.format("kinesis_py")
        .option("streamName", cfg.stream_name or "")
        .option("initialPosition", cfg.initial_position)
        .option("maxRecords", str(cfg.max_records))
    )
    if cfg.region:
        reader = reader.option("region", cfg.region)
    if client_factory or cfg.client_factory:
        reader = reader.option("clientFactory", client_factory or cfg.client_factory)
    for k, v in (cfg.options or {}).items():
        reader = reader.option(k, str(v))
    return reader.load().select(F.col("payload"))


def kinesis_connector_options(cfg: InputConfig) -> dict[str, str]:
    """Option map for the spark-sql-kinesis JVM connector (documented
    surface: streamName, region, initialPosition, consumerName,
    maxFetchRate) derived from the loader config — factored out so the
    mapping is testable without a connector jar on the classpath."""
    opts = {
        "streamName": cfg.stream_name or "",
        "initialPosition": cfg.initial_position,
        "consumerName": cfg.app_name,
    }
    if cfg.region:
        opts["region"] = cfg.region
    if cfg.max_records:
        opts["maxFetchRate"] = str(cfg.max_records)
    return opts


def kinesis_connector_stream(spark: SparkSession, cfg: InputConfig) -> DataFrame:
    """Kinesis via a JVM spark-kinesis connector jar (scale-out path: one
    receiving task per shard). Raises a clear error when no jar is on the
    classpath — OSS PySpark doesn't bundle one. NOTE: the pure-Python
    scale-out path is kinesis_stream with readerMode=partitioned
    (sources/kinesis_source.KinesisPartitionedReader), which needs no jar."""
    reader = spark.readStream.format("kinesis")
    for k, v in kinesis_connector_options(cfg).items():
        reader = reader.option(k, v)
    try:
        df = reader.load()
    except Exception as e:  # connector jar missing
        raise NotImplementedError(
            "kinesis connector source requires a spark-kinesis connector jar "
            "on the classpath (e.g. spark-sql-kinesis); use kinesis_stream "
            "(python polling source) or the file source instead"
        ) from e
    return df.select(F.col("data").alias("payload"))


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic load source for soak testing the pipeline."""
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    line = F.concat(
        F.lit('{"schema": "iglu:com.example/rate/jsonschema/1-0-0", "data": {"n": '),
        F.col("value").cast("string"),
        F.lit("}}"),
    )
    return df.select(line.cast("binary").alias("payload"))
