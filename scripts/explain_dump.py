"""Dump .explain('formatted') for named queries to
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (default round: r14).

Usage: python scripts/explain_dump.py <tag> <query_prefix> [...]
  tag           e.g. 'before' / 'after'
  query_prefix  one or more qNN prefixes (or full names) from the QUERIES
                registry; 'ALL' dumps every registry entry.

Runs under the bench's session shape (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cpus) on $SPARK_GRAFT_SF_DIR (default sf0.1) so the captured
plans match what the bench executes. Plans are captured WITHOUT executing
the query (explain is planning-only), except that operators which run
eager internal jobs (checkpointing iterative loops) will execute those
internals — unavoidable, they are part of plan construction.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
)


def main() -> None:
    tag = sys.argv[1]
    prefixes = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, OUT_DIR.rsplit("/plans", 1)[0])

    from snowplow_s3_loader_spark.session import get_spark

    spark = get_spark(
        app_name=f"explain-{tag}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    from snowplow_s3_loader_spark.plans.queries import QUERIES

    names = (
        sorted(QUERIES)
        if prefixes == ["ALL"]
        else [n for n in sorted(QUERIES) if any(n.startswith(p) for p in prefixes)]
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
