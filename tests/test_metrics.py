"""Metrics plumbing (O11): query listener captures micro-batch progress;
MetricsState absorbs action-log counts; StatsD emitter produces well-formed
datagrams on a real UDP socket."""

from __future__ import annotations

import socket
import time

from snowplow_s3_loader_spark.streaming.actions import ActionLog
from snowplow_s3_loader_spark.streaming.metrics import (
    LoaderQueryListener,
    MetricsState,
    StatsdEmitter,
)


def test_listener_captures_progress(spark, tmp_path):
    state = MetricsState()
    listener = LoaderQueryListener(state)
    spark.streams.addListener(listener)
    try:
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        (in_dir / "a.csv").write_text("1,2\n3,4\n")
        q = (
            spark.readStream.schema("a int, b int")
            .csv(str(in_dir))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener events are delivered async
        for _ in range(50):
            if state.snapshot()["input_rows"] >= 2:
                break
            time.sleep(0.2)
        snap = state.snapshot()
        assert snap["input_rows"] >= 2
        assert snap["batches"] >= 1
        assert snap["latency_millis"] > 0
    finally:
        spark.streams.removeListener(listener)


def test_state_absorbs_action_log():
    state = MetricsState()
    log = ActionLog()
    log.record("AddedCountMetric", 5)
    log.record("SetE2ELatencyMetric", 1200)
    log.record("AddedCountMetric", 3)
    state.absorb_actions(log)
    snap = state.snapshot()
    assert snap["count"] == 8
    assert snap["e2e_latency_millis"] == 1200


def test_statsd_datagrams():
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(5)
    port = recv.getsockname()[1]

    state = MetricsState()
    log = ActionLog()
    log.record("AddedCountMetric", 7)
    log.record("SetE2ELatencyMetric", 450)
    state.absorb_actions(log)

    emitter = StatsdEmitter("127.0.0.1", port, prefix="test.loader")
    emitter.emit(state)
    got = {recv.recvfrom(1024)[0].decode() for _ in range(4)}
    assert "test.loader.count:7|c" in got
    assert "test.loader.e2e_latency_millis:450|g" in got
    assert any(d.startswith("test.loader.latency_collector_to_load:") for d in got)
    recv.close()
