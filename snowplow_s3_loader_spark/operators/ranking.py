"""Distributed global ranking — the scale-safe replacement for
`Window.orderBy(...)` with no partitionBy, which funnels every row through a
single task (Spark warns `WindowExec: No Partition Defined`).

Two-phase formulation (the classic top-k/ranking pattern):
  1. range-repartition on the order key, local row_number per partition
     (each task sorts only its slice);
  2. per-partition counts (P tiny rows) -> cumulative offsets on the driver
     -> broadcast join -> global row_number = local + offset.

The order key MUST be a total order (include a unique tiebreak column);
then row_number == rank == dense_rank, and ntile derives in closed form
from (row_number, total).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Append a 1-based global row number under a TOTAL order (pass a unique
    tiebreak in order_cols). Returns (df_with_rn, total_rows).

    No single-partition stage: the sort is range-partitioned, the offset
    table is one tiny row per partition (collected + broadcast back).

    The range-partitioned, locally-numbered frame is eagerly
    localCheckpointed (it feeds two consumers whose re-evaluations could
    otherwise draw different range boundaries — see the inline comment);
    sessions running many ranking calls can reclaim the blocks with
    dedup.release_materialized on the RETURNED frame's lineage, and the
    bench/battery harnesses sweep leftover checkpoint blocks between
    runs.
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_part, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    )
    # PIN one evaluation: `local` feeds BOTH the counts branch and the
    # output join, and RangePartitioner's sample seed incorporates the
    # RDD id — re-evaluating the plan can draw DIFFERENT range
    # boundaries per branch, so the offsets describe one partitioning
    # while the rows carry another (observed: 10000 rows -> 9737
    # distinct rns with gaps to 10247 on the q94 histogram input).
    # An eager localCheckpoint makes the partition assignment a fact.
    local = local.localCheckpoint(eager=True)
    # per-partition counts: P rows only (bounded by cluster partitions, not
    # data), so the single-partition cumulative window over them is safe at
    # any scale; one collect of the grand total remains (callers need it as
    # a plain int for ntile's closed form)
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # localCheckpoint, not persist(): same one-computation guarantee for the
    # .first() below + the broadcast join, but the (tiny, P-row) blocks are
    # GC-tracked by the ContextCleaner instead of leaking in the SQL cache
    # for the session lifetime
    off_df = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_off"), "_cnt"
    ).localCheckpoint(eager=True)
    total_row = off_df.agg(F.sum("_cnt")).first()[0]
    if total_row is None:
        return df.withColumn(rn_col, F.lit(None).cast("int")), 0
    out = (
        local.join(F.broadcast(off_df.drop("_cnt")), "_pid")
        .withColumn(rn_col, (F.col("_lrn") + F.col("_off")).cast("int"))
        .drop("_pid", "_lrn", "_off")
    )
    return out, int(total_row)


def ntile_from_row_number(rn: Column, total: int, k: int) -> Column:
    """Closed-form ntile(k) from a global row number: the first `total % k`
    buckets hold ceil(total/k) rows, the rest floor(total/k) — exactly the SQL
    ntile contract, with no global window."""
    q, r = divmod(total, k)
    if q == 0:
        # fewer rows than buckets: bucket i gets row i
        return rn.cast("int")
    head = r * (q + 1)
    return (
        F.when(rn <= head, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(F.lit(r) + F.floor((rn - head - 1) / q) + 1)
        .cast("int")
    )
