"""Bad-row dead-letter sink — O12 (Processing.scala:315-331; Kinesis
producer caps config.aws.reference.hocon:85-103).

Two implementations behind one interface:
  - FileBadSink: newline-delimited JSON files (tests/local runs)
  - KinesisBadSink: put_records batched to the reference's caps
    (500 records / 5 MiB per call) with partial-failure retry

Two emission paths per sink:
  - send(rows): driver-side list — unit tests and tiny backfills only.
  - send_df(df): DISTRIBUTED — serialized rows are emitted from the
    executors (write.text / foreachPartition); only (count, bytes)
    aggregates return to the driver via df.observe. This is the pipeline's
    path: the reference streams bad rows through a parallel sink pipe
    (Processing.scala:315-331), and a poison batch where bad ≈ all rows
    must never materialize rows on the driver.
"""

from __future__ import annotations

import os
import time
import uuid as uuid_mod
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class BadSink:
    def send(self, serialized_rows: list[bytes]) -> None:  # pragma: no cover
        raise NotImplementedError

    def send_df(self, df: DataFrame, row_col: str = "row") -> tuple[int, int]:
        """Distributed emission. Returns (row_count, total_bytes)."""
        raise NotImplementedError  # pragma: no cover


def _observed(df: DataFrame, row_col: str) -> tuple[DataFrame, Observation]:
    """Attach count/bytes metrics so the emitting action is the ONLY job."""
    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.octet_length(row_col)), F.lit(0)).alias("n_bytes"),
    )
    return observed, obs


@dataclass
class FileBadSink(BadSink):
    directory: str

    def send(self, serialized_rows: list[bytes]) -> None:
        if not serialized_rows:
            return
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"bad-{uuid_mod.uuid4().hex}.jsonl")
        with open(path, "wb") as f:
            for row in serialized_rows:
                f.write(row)
                f.write(b"\n")

    def send_df(self, df: DataFrame, row_col: str = "row") -> tuple[int, int]:
        observed, obs = _observed(df, row_col)
        # Distributed text write: each task writes its own part file to the
        # (Hadoop-compatible) target — no rows on the driver.
        observed.select(F.col(row_col).alias("value")).write.mode("append").text(self.directory)
        m = obs.get
        return int(m["n"]), int(m["n_bytes"])


def iter_record_batches(
    rows: Iterable[bytes], record_limit: int, byte_limit: int
) -> Iterator[list[bytes]]:
    """Chunk rows into PutRecords batches under the reference caps
    (recordLimit=500, byteLimit=5 MiB — config.aws.reference.hocon:96-99)."""
    batch: list[bytes] = []
    batch_bytes = 0
    for row in rows:
        if batch and (len(batch) >= record_limit or batch_bytes + len(row) > byte_limit):
            yield batch
            batch, batch_bytes = [], 0
        batch.append(row)
        batch_bytes += len(row)
    if batch:
        yield batch


def put_records_with_retry(
    client,
    stream_name: str,
    rows: list[bytes],
    max_attempts: int = 5,
    backoff_seconds: float = 0.2,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """One PutRecords call with partial-failure retry.

    Kinesis reports throttled/failed records via FailedRecordCount + per-record
    ErrorCode; only the failed subset is retried (with exponential backoff),
    and after max_attempts the call raises so the Spark task — and hence the
    micro-batch — fails and is reprocessed (at-least-once, matching the
    reference's dead-letter delivery guarantee)."""
    records = [{"Data": r, "PartitionKey": uuid_mod.uuid4().hex} for r in rows]
    for attempt in range(max_attempts):
        resp = client.put_records(StreamName=stream_name, Records=records)
        if not int(resp.get("FailedRecordCount", 0)):
            return
        records = [
            rec
            for rec, result in zip(records, resp["Records"])
            if result.get("ErrorCode")
        ]
        if attempt < max_attempts - 1:
            sleep(backoff_seconds * (2**attempt))
    raise RuntimeError(
        f"{len(records)} bad rows undelivered to {stream_name} after {max_attempts} attempts"
    )


def _default_client_factory(region: str | None):
    try:
        import boto3
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("KinesisBadSink requires boto3 (not installed)") from e
    return boto3.client("kinesis", region_name=region)


@dataclass
class KinesisBadSink(BadSink):
    """PutRecords batching per the reference caps (recordLimit=500,
    byteLimit=5 MiB — hocon:96-99); random partition key (CHANGELOG #180);
    partial-failure retry with bounded attempts.

    client_factory is injectable for tests (called with the region; must be
    picklable for the distributed path)."""

    stream_name: str
    region: str | None = None
    record_limit: int = 500
    byte_limit: int = 5_242_880
    max_attempts: int = 5
    backoff_seconds: float = 0.2
    client_factory: Callable = _default_client_factory

    def _send_rows(self, client, rows: Iterable[bytes]) -> None:
        for batch in iter_record_batches(rows, self.record_limit, self.byte_limit):
            put_records_with_retry(
                client,
                self.stream_name,
                batch,
                max_attempts=self.max_attempts,
                backoff_seconds=self.backoff_seconds,
            )

    def send(self, serialized_rows: list[bytes]) -> None:
        if not serialized_rows:
            return
        self._send_rows(self.client_factory(self.region), serialized_rows)

    def send_df(self, df: DataFrame, row_col: str = "row") -> tuple[int, int]:
        # Counts come back as one (partition_id, rows, bytes) record per
        # partition through collect(), which returns exactly ONE result per
        # partition no matter how many task attempts ran — accumulators
        # (round 2) double-counted on retries/speculation and over-reported
        # the SentToBad metrics. The send itself stays at-least-once on
        # retry, the reference's own delivery guarantee.
        sink = self

        def _emit(pid: int, rows):
            client = sink.client_factory(sink.region)
            n = nb = 0

            def counted():
                nonlocal n, nb
                for r in rows:
                    data = r[0].encode()
                    n += 1
                    nb += len(data)
                    yield data

            # one client per partition; rows stream through
            # iter_record_batches without full materialization
            sink._send_rows(client, counted())
            yield (pid, n, nb)

        results = (
            df.select(F.col(row_col)).rdd.mapPartitionsWithIndex(_emit).collect()
        )
        by_pid = {pid: (n, nb) for pid, n, nb in results}
        return (
            sum(n for n, _ in by_pid.values()),
            sum(nb for _, nb in by_pid.values()),
        )
