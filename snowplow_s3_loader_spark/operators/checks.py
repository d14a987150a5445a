"""Declarative data-quality constraint suite (round 7) — the
Deequ/Great-Expectations-style gate every production pipeline runs before
publishing a table (beyond the reference's surface: its loader lands
blobs and has no table semantics, Processing.scala:69-77 /
S3Sink.scala:29-58). A constraint list compiles to ONE conditional
aggregation over the frame (violation counts are F.sum(cond) columns,
multi-uniqueness rides the same Expand pass Spark uses for q92's
multi-count_distinct), plus one anti-join branch per referential check —
the scan is never repeated per constraint, and nothing collects.

All metrics are exact BIGINT violation counts, so the suite hash-matches
a DuckDB oracle with zero tolerance.

Checks (name, metric):
- ``not_null(col)``        -> null count
- ``unique(cols)``         -> duplicate row count among rows whose key
  columns are all non-null (SQL uniqueness semantics: NULL keys are
  neither duplicates nor distinct values)
- ``in_set(col, values)``  -> count of non-null values outside the set
- ``in_range(col, lo, hi)``-> count of non-null values outside [lo, hi]
- ``matches(col, regex)``  -> count of non-null values not rlike regex
- ``ref(col, dim, dim_col)``-> orphan count (left-anti against the dim)

``passed`` is 1 iff the metric is 0 (or <= the per-check ``tolerance``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    kind: str
    name: str
    col: str | None = None
    cols: tuple[str, ...] = ()
    values: tuple = ()
    lo: object = None
    hi: object = None
    regex: str | None = None
    ref_df: DataFrame | None = None
    ref_col: str | None = None
    tolerance: int = 0


def not_null(col: str, name: str | None = None, tolerance: int = 0) -> Check:
    return Check("not_null", name or f"not_null({col})", col=col, tolerance=tolerance)


def unique(*cols: str, name: str | None = None, tolerance: int = 0) -> Check:
    return Check(
        "unique", name or f"unique({','.join(cols)})", cols=tuple(cols), tolerance=tolerance
    )


def in_set(col: str, values, name: str | None = None, tolerance: int = 0) -> Check:
    return Check(
        "in_set", name or f"in_set({col})", col=col, values=tuple(values), tolerance=tolerance
    )


def in_range(col: str, lo, hi, name: str | None = None, tolerance: int = 0) -> Check:
    return Check(
        "in_range", name or f"in_range({col})", col=col, lo=lo, hi=hi, tolerance=tolerance
    )


def matches(col: str, regex: str, name: str | None = None, tolerance: int = 0) -> Check:
    return Check(
        "matches", name or f"matches({col})", col=col, regex=regex, tolerance=tolerance
    )


def ref(
    col: str, ref_df: DataFrame, ref_col: str, name: str | None = None, tolerance: int = 0
) -> Check:
    return Check(
        "ref",
        name or f"ref({col})",
        col=col,
        ref_df=ref_df,
        ref_col=ref_col,
        tolerance=tolerance,
    )


def _violation_expr(c: Check):
    if c.kind == "not_null":
        return F.col(c.col).isNull()
    if c.kind == "in_set":
        return F.col(c.col).isNotNull() & ~F.col(c.col).isin(*c.values)
    if c.kind == "in_range":
        col = F.col(c.col)
        return col.isNotNull() & ((col < F.lit(c.lo)) | (col > F.lit(c.hi)))
    if c.kind == "matches":
        return F.col(c.col).isNotNull() & ~F.col(c.col).rlike(c.regex)
    raise ValueError(f"unknown row-wise check kind {c.kind!r}")


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check_name, metric, passed) per check, exact-integer metrics.

    Execution shape: all row-wise checks and uniqueness checks compile
    into ONE aggregation over ``df`` (conditional sums + exact
    count_distinct — one scan however long the check list gets); the
    1-row result unpivots to rows with ``stack``. Each referential
    check adds one left-anti-join count branch, unioned in. At 100 TB
    the anti joins are the only shuffles, and each dim side is
    broadcast-eligible under AQE like any other semi/anti join."""
    if not checks:
        raise ValueError("checks must be non-empty")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    bad = [n for n in names if "'" in n or "\\" in n]
    if bad:
        raise ValueError(f"check names may not contain quotes/backslashes: {bad}")

    aggs = []
    agged_names = []
    ref_checks = []
    for i, c in enumerate(checks):
        if c.kind == "ref":
            ref_checks.append(c)
            continue
        if c.kind == "unique":
            # SQL uniqueness ignores NULL keys: both the row count and
            # the distinct count range over rows with ALL key columns
            # non-null (count_distinct already skips any-null rows; a
            # plain count(*) would report phantom duplicates for every
            # NULL-keyed row — round-7 review finding)
            all_set = F.lit(True)
            for x in c.cols:
                all_set = all_set & F.col(x).isNotNull()
            aggs.append(
                (
                    F.count(F.when(all_set, F.lit(1)))
                    - F.count_distinct(*[F.col(x) for x in c.cols])
                ).cast("long").alias(f"m{i}")
            )
        else:
            aggs.append(
                F.coalesce(
                    F.sum(_violation_expr(c).cast("long")), F.lit(0)
                ).cast("long").alias(f"m{i}")
            )
        agged_names.append((i, c))
    parts = []
    if agged_names:
        one = df.agg(*aggs)
        stack_args = ", ".join(f"'{c.name}', m{i}" for i, c in agged_names)
        tol = F.lit(0)
        for _, c in agged_names:
            if c.tolerance:
                tol = F.when(
                    F.col("check_name") == c.name, F.lit(c.tolerance)
                ).otherwise(tol)
        parts.append(
            one.select(
                F.expr(
                    f"stack({len(agged_names)}, {stack_args}) AS (check_name, metric)"
                )
            ).select(
                "check_name",
                "metric",
                (F.col("metric") <= tol).cast("int").alias("passed"),
            )
        )
    for c in ref_checks:
        orphans = (
            df.select(F.col(c.col).alias("__k"))
            .where(F.col("__k").isNotNull())
            .join(
                c.ref_df.select(F.col(c.ref_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("metric"))
            .select(
                F.lit(c.name).alias("check_name"),
                "metric",
                (F.col("metric") <= F.lit(c.tolerance)).cast("int").alias("passed"),
            )
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
