"""Join strategy helpers for scale (SURVEY.md optimization goals):
salting for skewed keys, bucketing for shuffle-free co-located joins.

These complement AQE (which this engine enables by default — skew-join
splitting + partition coalescing happen at runtime): salting is for the
cases AQE can't fix (e.g. one hot key inside a single partition of a
broadcast-ineligible join), bucketing is for *repeated* joins on the same
key where paying one bucketed write amortizes every later shuffle away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side to a smaller side by exploding the small
    side across `n_salts` replicas: hot keys spread over n_salts tasks
    instead of hammering one.

    Equivalent to skewed.join(other, on, how) for row content (verified by
    test); the salt columns never escape.

    Delegates to operators.skew.salted_join: the salt there is
    content-derived (xxhash64 over the row), so task retries and
    speculative duplicates recompute identical salts — the
    monotonically_increasing_id salt this originally used could re-salt
    differently on recompute, which breaks exactly-once sinks downstream.
    """
    from snowplow_s3_loader_spark.operators.skew import salted_join as _impl

    return _impl(skewed, other, [on], n_salt=n_salts, how=how)


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted) table.

    Joins and aggregations between tables bucketed on the same keys with the
    same bucket count run WITHOUT a shuffle (verified by the plan test:
    no Exchange above the scans). At 100 TB this converts every recurring
    fact-to-fact join from a full shuffle into a zip of co-located buckets.
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Interval-interval OVERLAP join (closed bounds: match iff
    ``l_start <= r_end AND r_start <= l_end``) without the cartesian
    product a naive range condition plans to.

    Grid-bucketing: every interval explodes to the ``bucket_width``-wide
    cells it spans; candidates meet through an EQUI-join on the cell id
    (plus ``on`` block columns), so the pair space is bounded by cell
    co-occupancy instead of |L| x |R|. A pair overlapping in several
    shared cells would match repeatedly — instead of a dedup shuffle,
    each pair is emitted ONLY in the first cell both intervals occupy
    (``greatest(l_start, r_start) div width``), the standard
    report-once trick: no distinct, no extra shuffle.

    ``bucket_width`` is the scale knob: cells per interval is
    ``span div width + 1`` (the explode multiplier), while a too-wide
    cell degrades candidate selectivity. Pick it near the typical
    interval span. Bounds must be NON-NEGATIVE integers (``div``
    truncates toward zero — epoch micros/millis qualify).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    on = on or []
    ls, le = left_bounds
    rs, re_ = right_bounds
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            f"left and right share non-join columns {sorted(clash)}; rename first"
        )
    w = int(bucket_width)
    lc = left.withColumn(
        "__cell", F.explode(F.sequence(F.expr(f"{ls} div {w}"), F.expr(f"{le} div {w}")))
    )
    rc = right.withColumn(
        "__cell", F.explode(F.sequence(F.expr(f"{rs} div {w}"), F.expr(f"{re_} div {w}")))
    )
    first_shared = F.expr(f"greatest({ls}, {rs}) div {w}")
    return (
        lc.join(rc, on + ["__cell"])
        .where(
            (F.col(ls) <= F.col(re_))
            & (F.col(rs) <= F.col(le))
            & (F.col("__cell") == first_shared)
        )
        .drop("__cell")
    )
