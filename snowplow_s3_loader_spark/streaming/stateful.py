"""Custom keyed stateful streaming operators via applyInPandasWithState
(SURVEY.md SS2.3 'Streaming: stateful ops' — absent in the reference, which
only carries a batch accumulator; exposed engine-side for users who need
keyed state beyond built-in windows).

Pattern: GroupStateTimeout-driven per-key accumulators over Arrow batches.
State stays bounded: one row per live key, evicted on processing-time
timeout — the property that lets this run unbounded at 100 TB/day.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state_store(spark) -> bool:
    """Default the streaming state store to RocksDB (off-heap, incremental
    checkpoints) — at 100 TB/day keyed state must not live in executor
    heap. Conf-gated: a provider the user already pinned is respected.
    Returns True when RocksDB is (now) the active provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    cur = spark.conf.get(key, None)
    if cur:
        return cur == ROCKSDB_PROVIDER
    spark.conf.set(key, ROCKSDB_PROVIDER)
    return True


def streaming_first_seen(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Streaming exact-dedup across ALL history (not just a watermark window
    like dropDuplicates): emits only the first-ever row per key, keyed
    ValueState via the transformWithStateInPandas API (Spark 4).

    Needs the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) — keys at 100 TB scale
    live off-heap with incremental checkpointing, not in executor memory.
    Also needs `protobuf` (the transformWithState Python protocol dep; not
    in this image, so the test is importorskip-gated). The
    applyInPandasWithState operator below has no extra deps.
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = events.schema

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen boolean")

        def handleInputRows(self, key, rows, timerValues):
            if self._seen.exists():
                return
            first = None
            for pdf in rows:
                if len(pdf) and first is None:
                    first = pdf.iloc[[0]]
            if first is not None:
                self._seen.update((True,))
                yield first

        def close(self) -> None:
            pass

    return events.groupBy(*key_cols).transformWithStateInPandas(
        FirstSeen(), outputStructType=out_schema, outputMode="Append", timeMode="None"
    )


RUNNING_COUNT_SCHEMA = StructType(
    [
        StructField("user_id", IntegerType()),
        StructField("n_events", LongType()),
        StructField("total_val", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", LongType())]
)


def running_user_counts(
    events: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running (count, sum) across micro-batches.

    Input columns: user_id int, val int. Emits the updated running totals
    for every user seen in the batch.

    timeout_ms: processing-time state eviction for always-on deployments
    (bounds state at scale). Leave None for availableNow/backfill runs —
    ProcessingTimeTimeout makes Trigger.AvailableNow schedule empty batches
    indefinitely to fire timeouts, so the query never terminates.
    """

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["val"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_val": [total]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_COUNT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    watermark_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of operators.dedup.
    exact_dedup: the first record per key is emitted, later duplicates are
    dropped, and (unlike a naive dropDuplicates) the dedup STATE IS BOUNDED:
    dropDuplicatesWithinWatermark evicts keys once the watermark passes
    `delay`, so state size tracks the event-time window, not the full
    stream history. At 100 TB/day this is the difference between a working
    pipeline and an OOM — pick `delay` = the max expected duplicate skew
    (e.g. the Kinesis producer's retry horizon)."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
