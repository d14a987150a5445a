"""Kinesis streaming source as a PySpark Python Data Source (no connector
jar needed) — the reference's primary input (AwsApp.scala:19-23, input
config config.aws.reference.hocon:7-64).

The reference consumes Kinesis through a single KCL worker per pod
(common-streams kinesis factory); this reader mirrors that consumption
model: one polling consumer (the Spark driver) walks every open shard each
micro-batch with GetRecords, and Spark distributes the fetched records to
executors for the parse/classify/sink stages. Offsets are per-shard
sequence numbers checkpointed by Structured Streaming, giving the same
resume-from-checkpoint semantics as the reference's DynamoDB lease table
(initialPosition honored only on first run, hocon:14-22).

Scale note: driver-side polling is bounded by Kinesis's own per-shard read
cap (2 MiB/s × shards), which a single poller saturates for the shard
counts a single reference pod handles; for massively-sharded streams the
JVM connector-jar path in streams.py remains the scale-out route. The
executor-side pipeline (decompress/parse/write) is unaffected — it scales
with the cluster either way.

The wire client is injected via the `clientFactory` option (a
"module:callable" path) so every code path — shard discovery, iterator
typing, budgeted draining, resharding, throttle backoff, replay — is
unit-tested against an in-memory fake; only the real boto3 call is
env-gated.
"""

from __future__ import annotations

import importlib
import time
from typing import Any, Callable, Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("payload", BinaryType()),
        StructField("partitionKey", StringType()),
        StructField("sequenceNumber", StringType()),
        StructField("arrivalTimestamp", TimestampType()),
        StructField("shardId", StringType()),
    ]
)

# markers used in the offset map before a shard has yielded any record
_FRESH = ""  # read from the configured initial position
_CHILD = "\x00CHILD"  # shard discovered mid-stream (reshard child): TRIM_HORIZON
_CLOSED = "\x00CLOSED"  # shard fully drained after a reshard


def _boto3_factory(options: dict) -> Any:
    try:
        import boto3  # optional — not in the base image
    except ImportError as e:  # pragma: no cover - env gate
        raise NotImplementedError(
            "kinesis_py source requires boto3 (not installed); pass a "
            "clientFactory option for a custom/fake client"
        ) from e
    kwargs: dict = {}
    if options.get("region"):
        kwargs["region_name"] = options["region"]
    if options.get("endpointurl"):
        kwargs["endpoint_url"] = options["endpointurl"]
    return boto3.client("kinesis", **kwargs)


def _resolve_factory(path: str | None) -> Callable[[dict], Any]:
    if not path:
        return _boto3_factory
    mod_name, _, attr = path.partition(":")
    return getattr(importlib.import_module(mod_name), attr)


def _is_throttle(err: Exception) -> bool:
    name = type(err).__name__
    code = ""
    resp = getattr(err, "response", None)
    if isinstance(resp, dict):
        code = resp.get("Error", {}).get("Code", "")
    return "ProvisionedThroughputExceeded" in name or "Throttl" in code or (
        "ProvisionedThroughputExceeded" in code
    )


class KinesisPollingReader(SimpleDataSourceStreamReader):
    """Polling reader over all shards of one stream.

    Offset format: ``{"shards": {shard_id: sequence_number | "" | CLOSED}}``
    — "" means the shard hasn't produced a record yet (start from the
    configured initial position); CLOSED means the shard ended (reshard)
    and its children are being read instead.
    """

    def __init__(self, options: dict):
        # Spark hands DataSource options over as a case-insensitive dict
        # with lowercased keys; normalize so both direct construction and
        # the readStream path see the same names
        options = {k.lower(): v for k, v in options.items()}
        self.stream = options.get("streamname") or ""
        if not self.stream:
            raise ValueError("kinesis_py: streamName option is required")
        self.initial_position = (options.get("initialposition") or "TRIM_HORIZON").upper()
        self.at_timestamp = options.get("initialtimestamp")  # ISO8601/epoch, AT_TIMESTAMP
        self.max_records = int(options.get("maxrecords") or 750)  # hocon:32
        self.max_polls_per_shard = int(options.get("maxpollspershard") or 10)
        self.max_retries = int(options.get("maxretries") or 10)  # hocon:61
        self.backoff_s = float(options.get("minbackoffseconds") or 0.1)  # hocon:53
        self.max_backoff_s = float(options.get("maxbackoffseconds") or 1.0)
        self._factory_path = options.get("clientfactory")
        self._options = dict(options)
        self._client: Any = None
        # live NextShardIterator per shard, kept across read() calls so a
        # LATEST-positioned shard doesn't re-seek (and skip records that
        # arrived between empty polls); purely an optimization — recovery
        # always goes through sequence numbers
        self._iters: dict[str, str] = {}

    # -- wire helpers ------------------------------------------------------

    def _c(self) -> Any:
        if self._client is None:
            self._client = _resolve_factory(self._factory_path)(self._options)
        return self._client

    def _call(self, fn: Callable, **kw) -> dict:
        """Invoke a client method with throttle retry + exponential backoff
        (checkpointThrottledBackoffPolicy, hocon:52-55)."""
        delay = self.backoff_s
        for attempt in range(self.max_retries + 1):
            try:
                return fn(**kw)
            except Exception as e:  # noqa: BLE001 - classified below
                if not _is_throttle(e) or attempt == self.max_retries:
                    raise
                time.sleep(delay)
                delay = min(delay * 2, self.max_backoff_s)
        raise AssertionError("unreachable")

    def _list_shards(self) -> list[dict]:
        shards: list[dict] = []
        token = None
        while True:
            kw = {"NextToken": token} if token else {"StreamName": self.stream}
            resp = self._call(self._c().list_shards, **kw)
            shards.extend(resp.get("Shards", []))
            token = resp.get("NextToken")
            if not token:
                return shards

    def _iterator_for(self, shard_id: str, seq: str) -> str:
        kw: dict = {"StreamName": self.stream, "ShardId": shard_id}
        if seq and seq not in (_CLOSED, _CHILD):
            kw["ShardIteratorType"] = "AFTER_SEQUENCE_NUMBER"
            kw["StartingSequenceNumber"] = seq
        elif seq == _CHILD:
            # a reshard child must be read from its start or the records
            # written right after the split are lost
            kw["ShardIteratorType"] = "TRIM_HORIZON"
        elif self.initial_position == "AT_TIMESTAMP":
            kw["ShardIteratorType"] = "AT_TIMESTAMP"
            kw["Timestamp"] = self.at_timestamp
        else:
            kw["ShardIteratorType"] = self.initial_position  # TRIM_HORIZON | LATEST
        return self._call(self._c().get_shard_iterator, **kw)["ShardIterator"]

    # -- offset lifecycle --------------------------------------------------

    def initialOffset(self) -> dict:
        return {"shards": {s["ShardId"]: _FRESH for s in self._list_shards()}}

    def _drain_shard(
        self,
        shard_id: str,
        seq: str,
        budget: int,
        stop_at: str | None = None,
        use_cache: bool = True,
        max_polls: int | None = None,
    ) -> tuple[list[Tuple], str]:
        """Read up to `budget` records from one shard; returns (rows,
        final_seq). final_seq is CLOSED when the shard ended."""
        rows: list[Tuple] = []
        it = (self._iters.get(shard_id) if use_cache else None) or self._iterator_for(
            shard_id, seq
        )
        last = seq
        polls = max_polls if max_polls is not None else self.max_polls_per_shard
        for _ in range(polls):
            if it is None or budget <= 0:
                break
            resp = self._call(
                self._c().get_records, ShardIterator=it, Limit=min(budget, 10_000)
            )
            recs = resp.get("Records", [])
            it = resp.get("NextShardIterator")
            if use_cache and it is not None:
                self._iters[shard_id] = it
            for r in recs:
                last = r["SequenceNumber"]
                rows.append(
                    (
                        bytes(r["Data"]),
                        r.get("PartitionKey"),
                        r["SequenceNumber"],
                        r.get("ApproximateArrivalTimestamp"),
                        shard_id,
                    )
                )
                budget -= 1
                if stop_at is not None and last == stop_at:
                    return rows, last
            if it is None:  # shard closed by a reshard and fully drained
                self._iters.pop(shard_id, None)
                return rows, _CLOSED
            if not recs:  # caught up for this trigger
                break
        return rows, last

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        offsets = dict(start.get("shards", {}))
        # discover shards created by resharding: children get TRIM_HORIZON
        # (not the configured initial position) so post-split records are
        # never skipped
        for s in self._list_shards():
            offsets.setdefault(s["ShardId"], _CHILD)
        all_rows: list[Tuple] = []
        out: dict = {}
        for shard_id, seq in offsets.items():
            if seq == _CLOSED:
                out[shard_id] = _CLOSED
                continue
            rows, final = self._drain_shard(shard_id, seq, self.max_records)
            all_rows.extend(rows)
            out[shard_id] = final
        return iter(all_rows), {"shards": out}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Deterministic replay for batch recovery: re-read each shard from
        its start sequence up to (and including) its end sequence."""
        s_off = start.get("shards", {})
        e_off = end.get("shards", {})
        rows: list[Tuple] = []
        for shard_id, end_seq in e_off.items():
            begin = s_off.get(shard_id, _FRESH)
            if end_seq == begin:
                continue  # no progress recorded for this shard in the batch
            stop = None if end_seq == _CLOSED else end_seq
            got, _ = self._drain_shard(
                shard_id, begin, budget=2**31, stop_at=stop,
                use_cache=False, max_polls=10_000,
            )
            rows.extend(got)
        return iter(rows)

    def commit(self, end: dict) -> None:
        # Kinesis polling has no consumer-side ack; Structured Streaming's
        # checkpoint IS the lease table analog (hocon:10-13).
        pass


class KinesisPythonDataSource(DataSource):
    """`spark.readStream.format("kinesis_py")` — register with
    `spark.dataSource.register(KinesisPythonDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_py"

    def schema(self) -> StructType:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> KinesisPollingReader:
        return KinesisPollingReader(dict(self.options))
