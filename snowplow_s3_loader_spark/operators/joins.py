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
