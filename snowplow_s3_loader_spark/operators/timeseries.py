"""Time-series rollup operators: fixed-interval bucketing + gap fill
(the hypertable `time_bucket` + `time_bucket_gapfill` pattern, expressed
as a composition of stock DataFrame ops — SURVEY.md SS7.8 extension).

Scale notes (100 TB):
  - the rollup is ONE partial+final hash aggregation shuffled on
    (series keys, bucket) — the same shape as any groupBy; bucket count
    per key is bounded by the time span / interval, not row count.
  - the gap-fill spine is generated per series key from its own min/max
    bucket (sequence + explode): output rows ~ keys x span/interval, tiny
    next to the input; the fill join is an Exchange on the same
    (key, bucket) the rollup just produced, and AQE coalesces it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_UNITS = {"hour", "day", "week", "month", "minute", "second"}


def time_bucket(ts: Column, unit: str = "hour") -> Column:
    """Truncate a timestamp to a fixed bucket boundary."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    return F.date_trunc(unit, ts)


def bucket_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    aggs: list[Column],
    unit: str = "hour",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Aggregate into per-(keys, bucket) rows: one shuffle, map-side
    partials included for free."""
    return (
        df.withColumn(bucket_col, time_bucket(F.col(ts_col), unit))
        .groupBy(*keys, bucket_col)
        .agg(*aggs)
    )


def gap_fill(
    rolled: DataFrame,
    keys: list[str],
    fill: dict[str, Column],
    unit: str = "hour",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Left-join the rollup onto a dense per-key bucket spine so empty
    intervals appear with `fill` values (e.g. zero counts).

    The spine spans each key's own [min(bucket), max(bucket)] — series with
    different lifetimes don't get padded to a global range.
    """
    span = rolled.groupBy(*keys).agg(
        F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1")
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("_b0"), F.col("_b1"), F.expr(f"interval 1 {unit}"))
        ).alias(bucket_col),
    )
    out = spine.join(rolled, on=[*keys, bucket_col], how="left")
    for col_name, default in fill.items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), default))
    return out


def robust_outliers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    z: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier statistics — median/MAD gating, the
    numeric-column counterpart of the text quality filters (mean/stddev
    break down exactly when outliers exist; the modified z-score
    |x - median| / (1.4826 * MAD) > z is the standard robust rule,
    Iglewicz & Hoaglin 1993).

    Returns one row per group: (keys..., n, med, mad, n_outliers).
    Two grouped aggregations (median, then MAD = median of absolute
    deviations) + one conditional count — three shuffles on the group
    key, each with map-side partials; percentile is Spark's exact
    interpolated implementation, matching DuckDB's quantile_cont so the
    outputs oracle-check."""
    med = df.groupBy(*keys).agg(
        F.percentile(value_col, 0.5).alias("med"), F.count("*").alias("n")
    )
    with_med = df.join(med, keys)
    mad = with_med.groupBy(*keys).agg(
        F.percentile(F.abs(F.col(value_col) - F.col("med")), 0.5).alias("mad")
    )
    scored = with_med.join(mad, keys)
    return (
        scored.groupBy(*keys, "n", "med", "mad")
        .agg(
            F.sum(
                (
                    F.abs(F.col(value_col) - F.col("med"))
                    > F.lit(z) * F.lit(1.4826) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers")
        )
        .select(*keys, "n", F.round("med", 6).alias("med"),
                F.round("mad", 6).alias("mad"), "n_outliers")
    )


def rolling_anomalies(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    cents_col: str,
    window: int = 20,
    min_n: int = 8,
    threshold: int = 3,
) -> DataFrame:
    """Flag rows whose value deviates more than ``threshold`` rolling
    standard deviations from the trailing ``window`` rows of their
    group — the streaming-shaped quality gate for numeric columns
    (sensor glitches, price fat-fingers, bot bursts) with EXACT integer
    math: the test ``|x - mean| > t * stddev`` is evaluated as
    ``(x*n - S)^2 > t^2 * (n*Q - S^2)`` over BIGINT rolling sums
    (S = sum, Q = sum of squares, n = count of the trailing frame), so
    no float summation order exists anywhere and the flags are
    bit-identical across engines. ``cents_col`` must be an integer
    column (use the cents discipline for 2-dp floats). Overflow bound:
    the SQUARED terms are binding — ``t^2 * (n*Q - S^2)`` needs
    ``threshold * window * |x| <= ~3e9``, i.e. |x| up to ~5e7 cents at
    the default window=20, t=3; larger magnitudes must be rescaled
    first (the q95 discipline).

    One partitioned window pass (``ROWS BETWEEN window PRECEDING AND 1
    PRECEDING`` — the row itself is excluded so it cannot mask its own
    deviation); rows with fewer than ``min_n`` trailing observations are
    never flagged. A zero-variance history flags ANY deviation from the
    constant (documented; raise ``min_n`` if that is too eager).
    ``order_cols`` must be a total order within the group (append a
    unique id — the q08 lesson).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-window, -1)
    )
    c = F.col(cents_col).cast("long")
    n = F.count(cents_col).over(w)
    s = F.sum(c).over(w)
    q = F.sum(c * c).over(w)
    lhs = (c * n - s) * (c * n - s)
    rhs = F.lit(threshold * threshold) * (n * q - s * s)
    return df.withColumn(
        "is_anomaly",
        ((n >= F.lit(min_n)) & (lhs > rhs)).cast("boolean"),
    )


def cusum_alarms(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    target: int,
    slack: int,
    threshold: int,
) -> DataFrame:
    """Two-sided CUSUM drift detection (Page, "Continuous inspection
    schemes", Biometrika 1954) per series, in EXACT integer arithmetic.
    The textbook statistic is recursive — ``s_i = max(0, s_{i-1} +
    (x_i - target - slack))`` — which looks like it needs per-row
    iteration; it has a closed window form:

        s_i = P_i - min(0, min_{j<=i} P_j),   P = running sum of the
                                              drift increments

    so the whole detector is two stacked window passes (running sum,
    then running min of that sum) over the SAME partitioned sort — no
    recursion, no Python, no second shuffle (the second window reuses
    the first's partitioning and order). ``value_col`` must be integer
    (cents discipline); with integer inputs both engines' window sums
    are exact, so alarm flags hash-match bit for bit.

    Emits every input row plus ``s_hi`` (upward drift statistic),
    ``s_lo`` (downward), and ``alarm`` (either side above
    ``threshold``). Alarmed statistics keep accumulating rather than
    resetting — the standard monitoring read-out (first crossing per
    run of drift is the changepoint signal; the un-reset tail shows
    drift persistence). ``order_cols`` must be a total order within
    the group (the q08 lesson).

    Scale shape: one hash partition by series, one sort, all
    whole-stage-codegen'd expressions. State per row is O(1); series
    length is unbounded. (ROWS UNBOUNDED PRECEDING running frames are
    the streaming-compatible shape — the applyInPandasWithState twin
    would carry (P, minP) as its two-integer state.)
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = F.col(value_col).cast("long")
    p_hi = F.sum(x - F.lit(target + slack)).over(w)
    p_lo = F.sum(F.lit(target - slack) - x).over(w)
    out = df.withColumn("__p_hi", p_hi).withColumn("__p_lo", p_lo)
    s_hi = F.col("__p_hi") - F.least(F.min("__p_hi").over(w), F.lit(0))
    s_lo = F.col("__p_lo") - F.least(F.min("__p_lo").over(w), F.lit(0))
    return (
        out.withColumn("s_hi", s_hi)
        .withColumn("s_lo", s_lo)
        .withColumn(
            "alarm",
            (F.col("s_hi") > F.lit(threshold))
            | (F.col("s_lo") > F.lit(threshold)),
        )
        .drop("__p_hi", "__p_lo")
    )
