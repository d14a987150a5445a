"""Weak-scaling evidence for the stateful streaming operators
(VERDICT r13 item 7): drive streaming_heavy_hitters and
streaming_funnel over all three SFs' real tables, replayed as three
hash-split micro-batches, and record how the per-key state behaves as
the key/row count grows:

- heavy hitters: max emitted rows per shard per batch == the shard's
  live Misra-Gries summary size, bounded by `capacity` FOREVER — the
  documented per-key state bound; the artifact shows it flat while
  token mass grows ~100x across SFs.
- funnel: exactly one emission row per user per batch (O(1) per-key
  state: stage timestamps only).

Arrow batch width: the state updater receives per-key pandas chunks
bounded by spark.sql.execution.arrow.maxRecordsPerBatch (recorded from
the live session) — nothing in the operators accumulates an unbounded
pandas frame.

Usage: python scripts/streaming_weak_scaling.py [--out PATH]
Prints one JSON line per (operator, sf) case.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def _hh_case(spark, sf_dir: str, tmp: str, n_shards: int = 16, capacity: int = 256) -> dict:
    from snowplow_s3_loader_spark.operators.text import tokens
    from snowplow_s3_loader_spark.plans.parity import _run_stream, _write_stream_files
    from snowplow_s3_loader_spark.streaming.stateful import streaming_heavy_hitters
    from snowplow_s3_loader_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    n_toks = toks.count()
    slices = [
        toks.where(F.pmod(F.xxhash64("tok"), F.lit(3)) == i) for i in range(3)
    ]
    in_dir = _write_stream_files(slices, tmp)
    src = spark.readStream.schema("tok string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)

    per_key_rows: dict = {}

    def _fb(df, bid):
        for r in df.groupBy("shard").count().collect():
            per_key_rows[r["shard"]] = max(
                per_key_rows.get(r["shard"], 0), int(r["count"])
            )

    t0 = time.perf_counter()
    _run_stream(
        streaming_heavy_hitters(src, n_shards=n_shards, capacity=capacity),
        tmp,
        _fb,
    )
    dt = time.perf_counter() - t0
    max_state = max(per_key_rows.values()) if per_key_rows else 0
    assert max_state <= capacity, (max_state, capacity)
    return {
        "case": "heavy_hitters",
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "input_tokens": int(n_toks),
        "n_keys": len(per_key_rows),
        "capacity_bound": capacity,
        "max_state_entries_per_key": int(max_state),
        "wall_sec": round(dt, 2),
    }


def _funnel_case(spark, sf_dir: str, tmp: str) -> dict:
    from snowplow_s3_loader_spark.plans.parity import _run_stream, _write_stream_files
    from snowplow_s3_loader_spark.streaming.stateful import streaming_funnel
    from snowplow_s3_loader_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    n_rows = ev.count()
    # per-user time-ordered arrival across batches: slice by global time
    # tertiles (the parity module's documented exactness case). The
    # tertile boundaries come from approxQuantile so the measurement
    # never runs an unpartitioned ntile window over the whole table.
    evm = ev.withColumn("__us", F.unix_micros(F.col("ts")))
    q1, q2 = evm.approxQuantile("__us", [1 / 3, 2 / 3], 0.0)
    slices = [
        evm.where(F.col("__us") < F.lit(int(q1))).drop("__us"),
        evm.where(
            (F.col("__us") >= F.lit(int(q1))) & (F.col("__us") < F.lit(int(q2)))
        ).drop("__us"),
        evm.where(F.col("__us") >= F.lit(int(q2))).drop("__us"),
    ]
    in_dir = _write_stream_files(slices, tmp)
    src = spark.readStream.schema(
        "user_id bigint, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(in_dir)

    per_key_rows: dict = {}

    def _fb(df, bid):
        for r in df.groupBy("user_id").count().collect():
            per_key_rows[r["user_id"]] = max(
                per_key_rows.get(r["user_id"], 0), int(r["count"])
            )

    t0 = time.perf_counter()
    _run_stream(
        streaming_funnel(
            src, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ),
        tmp,
        _fb,
    )
    dt = time.perf_counter() - t0
    max_rows = max(per_key_rows.values()) if per_key_rows else 0
    assert max_rows <= 1, max_rows
    return {
        "case": "funnel",
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "input_rows": int(n_rows),
        "n_keys": len(per_key_rows),
        "per_key_emission_bound": 1,
        "max_rows_per_key": int(max_rows),
        "wall_sec": round(dt, 2),
    }


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    from snowplow_s3_loader_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="streaming-weak-scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    records = [
        {
            "arrow_max_records_per_batch": spark.conf.get(
                "spark.sql.execution.arrow.maxRecordsPerBatch"
            )
        }
    ]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        for case in (_hh_case, _funnel_case):
            with tempfile.TemporaryDirectory() as tmp:
                rec = case(spark, sf_dir, tmp)
            records.append(rec)
            print(json.dumps(rec))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(records, f, indent=1)
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
