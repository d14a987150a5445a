"""Incremental aggregate maintenance — keep a keyed aggregate table
(count / sum / min / max per group) up to date from insert-only deltas
without rescanning the corpus: the batch materialized-view-maintenance
twin of Structured Streaming's stateful aggregation, and the same
generational pattern as graph.ComponentMap (which maintains connected
components incrementally).

The state rows ARE partial aggregates, so an update is Spark's native
partial/final merge: union the delta (projected row-wise into partial
shape) with the state and re-aggregate on the keys — ONE keyed shuffle,
no full-outer join, no window. Cost per update is O(|state| + |delta|) with the corpus never
re-read; at 100 TB the corpus-sized re-aggregation this replaces is the
difference between minutes and a full recompute.

Exactness: counts and integer sums are associative and
order-independent, so incrementally maintained state is bit-identical
to a full recompute (the q86 oracle checks exactly that). Floating
double sums are order-DEPENDENT — callers who need engine-portable
exactness aggregate integer micro-units (cents), the same discipline as
the bigram-LM micro-nats.

min/max are maintainable under INSERT-ONLY deltas; a delete/update
changelog would need per-key re-derivation (out of scope here —
cdc.apply_changelog covers row-level upserts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _measure_cols(
    sum_cols: tuple[str, ...], min_cols: tuple[str, ...], max_cols: tuple[str, ...]
) -> list[str]:
    return (
        ["n"]
        + [f"sum_{c}" for c in sum_cols]
        + [f"min_{c}" for c in min_cols]
        + [f"max_{c}" for c in max_cols]
    )


def agg_state(
    df: DataFrame,
    keys: list[str],
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build the aggregate state from scratch: per key, row count plus
    sum/min/max of the named measure columns. Schema:
    keys + n + sum_<c> + min_<c> + max_<c>."""
    aggs = [
        F.count("*").alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    ]
    return df.groupBy(*keys).agg(*aggs)


def update_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Merge an insert-only delta of RAW rows into the state built by
    ``agg_state`` (same keys/measures): project each delta row into
    partial-aggregate shape and re-aggregate the union on the keys —
    state rows are partial aggregates, so sum-of-sums / min-of-mins is
    exactly Spark's map-side-combine merge step. New keys appear, and
    existing keys update, in the same single shuffle.

    Equivalent to ``agg_state(full_corpus)`` for counts and integer
    sums (associative + commutative); see the module docstring for the
    float caveat."""
    expected = set(keys) | set(_measure_cols(sum_cols, min_cols, max_cols))
    missing = expected - set(state.columns)
    if missing:
        raise ValueError(f"state is missing columns {sorted(missing)}")
    # project raw delta rows straight into partial-aggregate shape
    # (n=1, sum_<c>=min_<c>=max_<c>=<c>) instead of pre-aggregating:
    # the union's final groupBy is then the ONLY shuffle in the whole
    # update, and Spark's map-side combine still partially aggregates
    # the delta rows before they move (plan-gated in tests).
    d = delta.select(
        *keys,
        F.lit(1).cast("long").alias("n"),
        *[F.col(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.col(c).alias(f"min_{c}") for c in min_cols],
        *[F.col(c).alias(f"max_{c}") for c in max_cols],
    )
    merged_aggs = [
        F.sum("n").alias("n"),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        *[F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols],
        *[F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols],
    ]
    cols = keys + _measure_cols(sum_cols, min_cols, max_cols)
    return (
        state.select(*cols)
        .unionByName(d.select(*cols))
        .groupBy(*keys)
        .agg(*merged_aggs)
    )
