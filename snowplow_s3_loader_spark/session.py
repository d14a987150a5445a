"""SparkSession construction with scale-appropriate defaults.

The reference sizes its parallelism from CPU cores (Environment.scala:100-117:
cpuParallelism = ceil(cores x factor)); in Spark that is executor/task
parallelism plus shuffle partition count. We enable AQE so the runtime
re-plans shuffles (partition coalescing, skew-join splitting) — at 100 TB the
static shuffle-partition number is always wrong in one direction or the other.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "snowplow-s3-loader-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Settings rationale:
      - AQE + skew join + partition coalescing: runtime re-planning so the
        same query code works at sf0.001 and at 100 TB.
      - UTC session timezone: the reference's path templating and timestamp
        handling are UTC-fixed (DynamicPath.scala:80-83); also keeps
        timestamp semantics aligned with the DuckDB oracle.
      - nanosAsLong: driver-generated events.parquet stores TIMESTAMP(NANOS)
        which Spark's vectorized reader refuses by default.
      - Arrow: all pandas_udf/applyInPandas paths batch via Arrow.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Driver heap: in local mode ALL executor threads share the driver JVM,
    # and Spark's 1g default OOMs ~32 concurrent tasks on any non-toy input
    # (observed: 200k-doc retrieval sweep). Only effective before the JVM
    # launches — getOrCreate on a live gateway ignores it, and a real
    # cluster sizes executor memory in its submit config instead.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # explicit (it is the default, but a deployment that flips it makes
        # every pandas_udf query pay worker-pool spin-up per stage): reuse
        # the Python worker processes across batches/queries
        .config("spark.python.worker.reuse", "true")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions if shuffle_partitions is not None else int(cpus)),
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally-created session.

    The correctness driver hands us its own SparkSession; these are the
    settings we can still fix up after the fact (all runtime SQL confs).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Shuffle-partition floor: only when the session still carries Spark's
    # untouched 200 default. 200 reduce tasks on a small-core runner is
    # pure scheduling overhead (measured 8.5s -> 2.6s on the shingle join),
    # and AQE can't coalesce stages over cached subtrees (windows/joins on
    # persisted frames keep the static number). A deliberate user setting
    # is left alone; a real cluster deployment sizes this (and AQE
    # initialPartitionNum) for its data volume.
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 8)),
        )
    return spark
