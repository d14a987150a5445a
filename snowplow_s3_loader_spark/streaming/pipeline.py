"""The loader pipeline — reference Processing.scala:69-77 re-expressed as
Structured Streaming with one foreachBatch body carrying the reference's
side-effect ordering contract:

    good file writes -> count/latency metrics -> bad-row send -> checkpoint
    (ProcessingSpec.scala:69-77, 119-130; checkpoint happens when
    foreachBatch returns — Spark commits offsets after the batch's sinks
    complete, matching the reference's deferred-ack at-least-once model,
    Processing.scala:333-336)

Stage mapping (SURVEY.md SS2.1):
    O1  source + envelope decompression  -> sources/* + operators/decompression
    O2/O3 parse/classify                 -> operators/parse.classify
    O5  group by schema                  -> partition-path column + partitionBy write
    O6  size+time batching               -> trigger(processingTime=maxDelay) +
                                            byte-capped file rolling in the blob sink
    O7/O10 gzip blob write               -> sinks/blob.write_batch
    O8  dynamic paths                    -> dynamic_path + functions.paths
    O11 metrics                          -> streaming/metrics + action log
    O12 bad rows                         -> badrows + sinks/bad_sink
    O13 ack/checkpoint                   -> option("checkpointLocation", ...)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowplow_s3_loader_spark import badrows
from snowplow_s3_loader_spark.config import LoaderConfig
from snowplow_s3_loader_spark.dynamic_path import get_partition
from snowplow_s3_loader_spark.functions.paths import partition_path
from snowplow_s3_loader_spark.igluschema import ATOMIC_SCHEMA
from snowplow_s3_loader_spark.operators.decompression import (
    DecompressionLimits,
    decompressed_stream,
)
from snowplow_s3_loader_spark.operators.parse import classify
from snowplow_s3_loader_spark.sinks.bad_sink import BadSink, FileBadSink
from snowplow_s3_loader_spark.sinks.blob import write_batch
from snowplow_s3_loader_spark.streaming.actions import ActionLog
from snowplow_s3_loader_spark.streaming.health import AppHealth


@dataclass
class LoaderPipeline:
    spark: SparkSession
    config: LoaderConfig
    bad_sink: BadSink | None = None
    actions: ActionLog = field(default_factory=ActionLog)
    health: AppHealth = field(default_factory=lambda: AppHealth())
    now_fn: Callable[[], datetime] = lambda: datetime.now(timezone.utc)
    deterministic_uuids: bool = False

    def __post_init__(self) -> None:
        if self.bad_sink is None:
            bad_dir = self.config.bad.path or (self.config.good.path.rstrip("/") + "-bad")
            self.bad_sink = FileBadSink(bad_dir)

    # ---------------- the foreachBatch body (O5..O13) ----------------

    def load_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cfg = self.config
        now = self.now_fn()

        if "payload" in batch_df.columns and "value" not in batch_df.columns:
            if cfg.decompression.enabled:
                lines = decompressed_stream(
                    batch_df,
                    limits=DecompressionLimits(
                        cfg.decompression.max_bytes_in_batch,
                        cfg.decompression.max_bytes_single_payload,
                    ),
                )
            else:
                lines = batch_df.select(
                    F.col("payload").cast("string").alias("value"),
                    F.lit(None).cast("string").alias("decompress_error"),
                )
        else:
            lines = batch_df.withColumn("decompress_error", F.lit(None).cast("string"))

        classified = classify(lines, cfg.purpose).persist()
        try:
            good = classified.filter(
                F.col("bad_message").isNull() & F.col("decompress_error").isNull()
            )

            # O8: resolve the partition template — schema tokens per row
            # (template stays literal for the atomic schema), time tokens
            # from the flush time
            template = cfg.good.partition_format or ""
            if cfg.purpose == "ENRICHED_EVENTS":
                resolved = get_partition(template, ATOMIC_SCHEMA, now)
                pp = F.lit(resolved)
            else:
                pp = partition_path(
                    template,
                    F.col("schema_key"),
                    F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"),
                )

            # one stats job feeds the count metric, the latency metric AND
            # the blob sink's byte-cap estimate (no second .first() action)
            stats = good.agg(
                F.count("*").alias("n"),
                F.min("collector_tstamp").alias("earliest"),
                F.avg(F.octet_length("value")).alias("avg_len"),
            ).first()
            n_good = stats["n"]

            # 1) good writes (O7/O10)
            if n_good:
                result = write_batch(
                    good.withColumn("__partition", pp),
                    cfg.good.path,
                    "__partition",
                    prefix=cfg.good.prefix,
                    max_bytes=cfg.batching.max_bytes,
                    now=now,
                    deterministic_uuids=self.deterministic_uuids,
                    row_count=n_good,
                    avg_line_bytes=stats["avg_len"],
                )
                for wf in result.files:
                    self.actions.record("WroteFile", wf.path, wf.n_bytes)
                self.health.blob_sink_ok = True

            # 2) metrics (O11): count, then e2e latency vs earliest tstamp
            self.actions.record("AddedCountMetric", n_good)
            if stats["earliest"] is not None:
                earliest = stats["earliest"]
                if earliest.tzinfo is None:
                    earliest = earliest.replace(tzinfo=timezone.utc)
                latency_ms = int((now - earliest).total_seconds() * 1000)
                self.actions.record("SetE2ELatencyMetric", max(0, latency_ms))

            # 3) bad rows (O12), size-capped (BadRowsSerializer.scala:24-44)
            # a real instant literal (aware datetime): badrows renders it as
            # ISO-8601 UTC with millis correctly under any session timezone
            ts_lit = F.lit(now)
            parse_bad = classified.filter(
                F.col("bad_message").isNotNull() & F.col("decompress_error").isNull()
            ).select(
                badrows.serialize_with_max_size(
                    badrows.generic_error(F.col("value"), F.col("bad_message"), ts_lit),
                    ts_lit,
                    cfg.bad.max_record_size,
                ).alias("row")
            )
            decomp_bad = classified.filter(F.col("decompress_error").isNotNull()).select(
                badrows.serialize_with_max_size(
                    badrows.loader_parsing_error(
                        F.col("value"), F.col("decompress_error"), ts_lit
                    ),
                    ts_lit,
                    cfg.bad.max_record_size,
                ).alias("row")
            )
            # Distributed emission (Processing.scala:315-331 parallel sink
            # pipe): rows leave from the executors; only (count, bytes) come
            # back to the driver — a poison batch where bad ≈ all rows never
            # materializes driver-side.
            n_bad, bad_bytes = self.bad_sink.send_df(parse_bad.union(decomp_bad))
            if n_bad:
                self.actions.record("SentToBad", n_bad, bad_bytes)
                self.health.bad_sink_ok = True

            # 4) checkpoint marker: foreachBatch returning = offsets commit
            self.actions.record("Checkpointed", batch_id)
            self.health.mark_progress()
        except Exception:
            self.health.blob_sink_ok = False
            raise
        finally:
            classified.unpersist()

    # ---------------- entry points ----------------

    def run_batch(self, df: DataFrame) -> None:
        """Batch-mode slice (tests, backfills): one load_batch call."""
        self.load_batch(df, batch_id=0)

    def run_stream(self, source: DataFrame, checkpoint: str | None = None):
        """Streaming entry: trigger(processingTime=maxDelay) gives the
        reference's time-bound flush (O6); checkpointLocation gives O13."""
        from snowplow_s3_loader_spark.streaming.stateful import (
            enable_rocksdb_state_store,
        )

        # loader stages are stateless, but any stateful operator a user
        # composes upstream of this sink gets the scale-safe store
        enable_rocksdb_state_store(source.sparkSession)
        writer = (
            source.writeStream.foreachBatch(self.load_batch)
            .trigger(processingTime=f"{int(self.config.batching.max_delay_seconds)} seconds")
            .outputMode("append")
        )
        ckpt = checkpoint or self.config.checkpoint_location
        if ckpt:
            writer = writer.option("checkpointLocation", ckpt)
        query = writer.start()
        self.health.setup_ok = True
        return query
