#!/usr/bin/env python
"""Benchmark harness: runs the full declared query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01...": sec, ...}, "sf": ...}

Each query executes fully via the noop sink (no driver collect — measures
plan execution, not result serialization to Python).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from snowplow_s3_loader_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    from snowplow_s3_loader_spark.plans.queries import QUERIES

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    timings: dict[str, float] = {}
    # warmup: q03 absorbs JVM/codegen startup, q49 spins up the Python/Arrow
    # worker pool (first pandas_udf pays ~5s once per session)
    for warm in ("q03_broadcast_join", "q49_grouped_percentiles"):
        QUERIES[warm](spark, sf_dir).write.mode("overwrite").format("noop").save()

    for name, fn in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep the bench line parseable even on breakage
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_set_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
