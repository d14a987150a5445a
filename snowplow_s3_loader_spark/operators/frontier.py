"""Exact distributed 2-D Pareto frontier (skyline).

(Beyond the reference's surface — SURVEY.md §7.8 scale extensions.)

The skyline operator (Börzsönyi, Kossmann & Stocker, "The Skyline
Operator", ICDE 2001) returns the points no other point dominates —
the "cheapest AND earliest" / "best quality per cost" frontier behind
data-selection and pricing analytics. The textbook formulation is a
quadratic NOT EXISTS self-join; the textbook single-node fix is one
global sort + prefix scan. Neither survives 100 TB: the first is
O(n²), the second funnels everything through one task (a global
unpartitioned window).

This implementation keeps the O(n log n) sort-scan idea but breaks the
single-task bottleneck with bucket decomposition:

1. **Reduce.** Normalize both dims to minimize (negate maximized
   dims), then `groupBy(x).agg(min(y))` — only the best y per distinct
   x can ever be on the frontier. Map-side combine bounds the shuffle
   by |distinct x|.
2. **Bucket.** Uniform `width_bucket` ranges over x (one min/max
   aggregation). Bucket choice affects only load balance, never the
   result.
3. **Bounded global state.** Per-bucket `min(y)` — at most
   `n_buckets` rows — collects to the driver, turns into each
   bucket's *exclusive prefix min* (the best y anywhere strictly left
   of the bucket), and broadcast-joins back. This is the only
   cross-bucket communication: O(n_buckets), not O(n).
4. **Parallel scan.** Inside each bucket a window
   (`partitionBy(bucket).orderBy(x).rangeBetween(unboundedPreceding,
   -1)` — RANGE, so equal-x peers are excluded) computes the local
   running strict-prefix min; a point survives iff it beats
   `least(local prefix min, bucket prefix min)`. Every window runs on
   its own bucket partition — no global sort task.

Dominance is the standard weak form: q dominates p iff q <= p on both
(normalized) dims and q < p on at least one. Output is the DISTINCT
frontier points in original-value space. Nulls in either dim are
dropped (a point with an unknown coordinate can neither dominate nor
be ranked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    maximize: tuple[bool, bool] = (False, False),
    n_buckets: int = 64,
) -> DataFrame:
    """Distinct 2-D skyline of (x_col, y_col); each dim minimized by
    default, maximized where ``maximize`` says so. Exact for integer
    dims (the recommended input — cents / epoch days / micro-units);
    float dims inherit float comparison semantics unchanged."""
    sign_x = -1 if maximize[0] else 1
    sign_y = -1 if maximize[1] else 1
    pts = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            (F.col(x_col) * sign_x).alias("__fx"),
            (F.col(y_col) * sign_y).alias("__fy"),
        )
    )
    # 1: only the minimal y per distinct x can be on the frontier
    best = pts.groupBy("__fx").agg(F.min("__fy").alias("__fy"))

    # 2: uniform buckets over x — load balance only, result-neutral
    rng = best.agg(F.min("__fx").alias("lo"), F.max("__fx").alias("hi")).collect()
    if not rng or rng[0]["lo"] is None:
        return df.select(x_col, y_col).limit(0)
    lo, hi = rng[0]["lo"], rng[0]["hi"]
    bucketed = best.withColumn(
        "__fb",
        F.expr(
            f"width_bucket(__fx, {lo!r}, {hi!r} + 1, {int(n_buckets)})"
        ).cast("int"),
    )

    # 3: exclusive prefix min across buckets — O(n_buckets) driver state
    bmins = {
        r["__fb"]: r["m"]
        for r in bucketed.groupBy("__fb").agg(F.min("__fy").alias("m")).collect()
    }
    prefix, run = {}, None
    for b in sorted(bmins):
        prefix[b] = run
        run = bmins[b] if run is None else min(run, bmins[b])
    spark = df.sparkSession
    prefix_rows = [(b, p) for b, p in prefix.items()]
    y_type = bucketed.schema["__fy"].dataType.simpleString()
    prefix_df = spark.createDataFrame(
        prefix_rows, f"__fb int, __fprev {y_type}"
    )

    # 4: per-bucket strict-prefix scan; RANGE -1 excludes equal-x peers
    w = (
        Window.partitionBy("__fb")
        .orderBy("__fx")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    scanned = (
        bucketed.join(F.broadcast(prefix_df), "__fb", "left")
        .withColumn("__flocal", F.min("__fy").over(w))
        .withColumn("__fprevmin", F.least("__flocal", "__fprev"))
    )
    frontier = scanned.where(
        F.col("__fprevmin").isNull() | (F.col("__fy") < F.col("__fprevmin"))
    )
    return frontier.select(
        (F.col("__fx") * sign_x).alias(x_col),
        (F.col("__fy") * sign_y).alias(y_col),
    )
