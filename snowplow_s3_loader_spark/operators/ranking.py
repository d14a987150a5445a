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


def global_running_total(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    rn_col: str = "rn",
    start_col: str = "start",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Append a 1-based global row number AND the EXCLUSIVE global
    running total of ``value_col`` (sum of all strictly-earlier rows)
    under a TOTAL order — global_row_number's two-phase shape carrying
    a value column: range-repartition on the order key, per-partition
    local row number + inclusive local prefix sum, per-partition
    (count, value-sum) offsets collected and broadcast back. Returns
    (df_with_rn_and_start, total_rows, total_value).

    No single-partition stage; the same eager-localCheckpoint pinning
    as global_row_number (two consumers over a RangePartitioner whose
    sample seed is plan-dependent). ``value_col`` must be non-null
    (a NULL poisons every later prefix; enforced with a per-row
    raise_error fold, zero extra scan)."""
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    v = F.col(value_col)
    v_checked = F.when(
        v.isNull(),
        F.raise_error(
            F.lit(
                f"global_running_total: value column {value_col!r} must "
                "be non-null (a NULL would poison every later prefix)"
            )
        ).cast("long"),
    ).otherwise(v.cast("long"))
    ranged = (
        df.withColumn("_val", v_checked)
        .repartitionByRange(n_part, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(w)).withColumn(
        "_lcum",
        F.sum("_val").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    local = local.localCheckpoint(eager=True)
    counts = local.groupBy("_pid").agg(
        F.count("*").alias("_cnt"), F.sum("_val").alias("_vsum")
    )
    ow = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_df = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(ow), F.lit(0)).alias("_off"),
        F.coalesce(F.sum("_vsum").over(ow), F.lit(0)).alias("_voff"),
        "_cnt",
        "_vsum",
    ).localCheckpoint(eager=True)
    tot = off_df.agg(
        F.sum("_cnt").alias("n"), F.sum("_vsum").alias("s")
    ).first()
    if tot["n"] is None:
        return (
            df.withColumn(rn_col, F.lit(None).cast("int")).withColumn(
                start_col, F.lit(None).cast("long")
            ),
            0,
            0,
        )
    out = (
        local.join(F.broadcast(off_df.drop("_cnt", "_vsum")), "_pid")
        .withColumn(rn_col, (F.col("_lrn") + F.col("_off")).cast("int"))
        .withColumn(
            start_col, F.col("_lcum") - F.col("_val") + F.col("_voff")
        )
        .drop("_pid", "_lrn", "_lcum", "_val", "_off", "_voff")
    )
    return out, int(tot["n"]), int(tot["s"])


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


def quantile_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    out_col: str = "pct_micro",
) -> DataFrame:
    """Per-group quantile (rank) normalization — the distribution-free
    feature transform (map each value to its within-group percentile)
    used to make heavy-tailed columns comparable across groups before
    training. Exact integer micro-units:

        pct_micro = (row_number - 1) * 1_000_000 div (n_group - 1)

    so the smallest row maps to 0, the largest to exactly 1_000_000,
    and a single-row group to 0 (documented degenerate case; NULL would
    poison downstream arithmetic). ``order_cols`` must be a total order
    within the group (append a unique id — the q08 lesson); with a
    total order row_number == rank, so ties never flip across engines.
    Truncating division on non-negative operands — identical in Spark
    (div) and DuckDB (//).

    Scale shape: ONE keyed window partition spec carries both the
    row_number and the group count (one hash exchange + one sort); the
    division is a projection. No unpartitioned window exists — for a
    GLOBAL quantile transform use `global_row_number` +
    `ntile_from_row_number` instead."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    wc = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__qr_rn", F.row_number().over(w))
        .withColumn("__qr_n", F.count(F.lit(1)).over(wc))
        .withColumn(
            out_col,
            F.when(
                F.col("__qr_n") > 1,
                F.expr("(__qr_rn - 1) * CAST(1000000 AS BIGINT) div (__qr_n - 1)"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .drop("__qr_rn", "__qr_n")
    )


def group_mode(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Deterministic per-group mode: the most frequent value, ties to
    the MINIMUM value (a tie rule both engines replay exactly — the
    q112 discipline). NULL values are excluded (an unknown cannot be
    the dominant value). Emits (group..., mode, mode_n).

    The reduction is ``min_by`` keyed on ``struct(-n, value)``: the
    smallest struct has the largest count (structs compare field-wise
    and only the COUNT is negated — counts are always numeric, so any
    orderable value type works, strings included), ties falling to the
    minimum value.

    Scale shape: one partial+final count per (group, value), then one
    partial+final min_by over the already-reduced count frame — two
    keyed aggregations, no window, no sort of the raw stream."""
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count("*").alias("__gm_n"))
    )
    best = counts.groupBy(*group_cols).agg(
        F.min_by(
            F.struct(
                F.col(value_col).alias("mode"), F.col("__gm_n").alias("mode_n")
            ),
            F.struct((-F.col("__gm_n")).alias("neg_n"), F.col(value_col).alias("v")),
        ).alias("__gm_best")
    )
    return best.select(*group_cols, "__gm_best.mode", "__gm_best.mode_n")


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_cols: list[Column],
    lo_micro: int,
    hi_micro: int,
) -> DataFrame:
    """Per-group winsorization at exact empirical percentiles: values
    below the group's ``lo_micro`` quantile clip up to the smallest
    value AT OR ABOVE that percentile; values above ``hi_micro`` clip
    down symmetrically — the standard heavy-tail feature clamp, exact
    because the percentile grid is `quantile_rank`'s integer micro-unit
    ladder over a total order (``value_col`` + ``tie_cols``).

    Appends (pct_micro, lo_bound, hi_bound, clipped). Scale shape: one
    keyed window pass for the ranks (quantile_rank's single hash
    exchange), one per-group conditional aggregation for the two bounds
    (a |groups|-sized frame, broadcast back), zero self-joins."""
    if not (0 <= lo_micro <= hi_micro <= 1_000_000):
        raise ValueError(
            f"need 0 <= lo <= hi <= 1e6, got ({lo_micro}, {hi_micro})"
        )
    from snowplow_s3_loader_spark.operators.dedup import checkpoint_nostats

    # the ranked frame feeds BOTH the bounds aggregation and the output
    # join — materialize the window pass once instead of re-sorting per
    # consumer
    ranked = checkpoint_nostats(
        quantile_rank(
            df, group_cols, [F.col(value_col), *tie_cols], out_col="pct_micro"
        )
    )
    v = F.col(value_col)
    bounds = ranked.groupBy(*group_cols).agg(
        F.min(F.when(F.col("pct_micro") >= lo_micro, v)).alias("lo_bound"),
        F.max(F.when(F.col("pct_micro") <= hi_micro, v)).alias("hi_bound"),
    )
    return ranked.join(F.broadcast(bounds), group_cols).withColumn(
        "clipped", F.least(F.greatest(v, F.col("lo_bound")), F.col("hi_bound"))
    )


def auc_moments(
    df: DataFrame, keys: list[str], score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney U statistic — the
    standard quality-classifier evaluation (is the model's score
    actually ranking positives above negatives?), tie-corrected and
    float-free. AUC = U / (n1*n0) with U = R1 - n1(n1+1)/2, R1 the sum
    of the positives' AVERAGE ranks; average ranks ride DOUBLED
    (min_rank + max_rank of the score tie group — the q132 identity),
    so every piece is BIGINT:

        u_dbl     = sum over positives of dbl_rank  -  n1*(n1+1)
        auc_micro = (u_dbl * 500000) div (n1 * n0)      [u_dbl >= 0]

    both truncating-exact and bit-identical across engines. The int64
    bound (2n^2 * 5e5 < 2^63, i.e. n <= ~2e6 rows per group) and the
    0/1 label domain are ENFORCED.

    Scale shape: one keyed sort (row_number), one (keys, score) tie
    window on the same sort prefix, one partial+final aggregation per
    group — executed ONCE: the per-group frame is checkpointed and both
    guards (label domain, int64 group-size bound) read one tiny scan of
    that |groups|-sized result instead of re-running the pipeline.

    Output: (keys..., n1, n0, u_dbl, auc_micro); auc_micro is NULL for
    single-class groups."""
    from snowplow_s3_loader_spark.operators.dedup import checkpoint_nostats

    lbl = F.col(label_col)
    ranked = df.select(
        *keys,
        F.col(score_col).alias("__s"),
        lbl.cast("long").alias("__l"),
        (~lbl.isin(0, 1) | lbl.isNull()).cast("long").alias("__b"),
        F.when(~lbl.isin(0, 1) | lbl.isNull(), lbl.cast("string")).alias(
            "__bv"
        ),
    ).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy(*keys).orderBy("__s")),
    )
    tie = Window.partitionBy(*keys, "__s")
    dbl = (F.min("__rn").over(tie) + F.max("__rn").over(tie)).cast("long")
    agg = checkpoint_nostats(
        ranked.withColumn("__dbl", dbl)
        .groupBy(*keys)
        .agg(
            F.sum("__l").alias("n1"),
            F.sum(1 - F.col("__l")).alias("n0"),
            F.sum(F.when(F.col("__l") == 1, F.col("__dbl"))).alias("__r1"),
            F.count("*").alias("__n"),
            F.sum("__b").alias("__badn"),
            F.first("__bv", ignorenulls=True).alias("__badv"),
        )
    )
    guard = agg.agg(
        F.max("__n").alias("mx"),
        F.sum("__badn").alias("bad"),
        F.first("__badv", ignorenulls=True).alias("badv"),
    ).collect()[0]
    if guard["bad"]:
        raise ValueError(
            f"auc_moments: label column {label_col!r} must be 0/1 "
            f"non-null; found {guard['badv']!r}"
        )
    if guard["mx"] is not None and guard["mx"] > 2_000_000:
        raise ValueError(
            f"auc_moments: group size {guard['mx']} exceeds the exact "
            "int64 bound (~2e6 rows/group); shard or sample first"
        )
    u = F.coalesce(F.col("__r1"), F.lit(0)) - F.col("n1") * (F.col("n1") + 1)
    return agg.select(*keys, "n1", "n0", u.alias("u_dbl")).select(
        *keys,
        "n1",
        "n0",
        "u_dbl",
        F.when(
            (F.col("n1") > 0) & (F.col("n0") > 0),
            F.expr("(u_dbl * 500000) div (n1 * n0)"),
        ).alias("auc_micro"),
    )
