"""Record linkage / entity resolution: edit-distance similarity joins.

The naive formulation of "find all string pairs within edit distance
tau" is an all-pairs `levenshtein()` cross join — quadratic in the
corpus and a non-starter at 100 TB. `edit_distance_join` implements the
segment-blocking scheme of PassJoin (Li, Deng, Feng, "PASS-JOIN: a
partition-based method for similarity joins", VLDB 2011): by the
pigeonhole principle, if ED(r, s) <= tau then at least one of the
tau+1 disjoint segments of s appears EXACTLY (same characters, start
position shifted by at most tau) as a substring of r. Candidates
therefore meet through a plain EQUI-join on (segment index, indexed
length, segment string) — the pair space is bounded by segment-key
co-occupancy, never |L| x |R| — and only candidates pay the
`levenshtein` verification.

Reference parity note: the reference loader (Processing.scala) has no
string-similarity surface; this operator is part of the LLM-pipeline
widening (noisy-catalog dedup, user-record linkage before behavioral
aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segment_keys(indexed: DataFrame, str_col: str, tau: int) -> DataFrame:
    """One (``__i``, ``__tlen``, ``__seg``) key row per segment of each
    indexed string: the even-partition scheme — ``k = tau+1`` disjoint
    segments covering the string, the first ``len % k`` segments one
    character longer. All pure JVM expressions (one explode, no UDF)."""
    k = tau + 1
    return (
        indexed.withColumn("__i", F.explode(F.array(*[F.lit(i) for i in range(k)])))
        .withColumn("__base", F.expr(f"__tlen div {k}"))
        .withColumn("__rem", F.col("__tlen") % k)
        .withColumn(
            "__seglen",
            F.col("__base") + F.when(F.col("__i") < F.col("__rem"), 1).otherwise(0),
        )
        .withColumn(
            "__segstart",
            F.col("__i") * F.col("__base") + F.least(F.col("__i"), F.col("__rem")),
        )
        .withColumn(
            "__seg",
            F.expr(f"substring({str_col}, __segstart + 1, __seglen)"),
        )
        .drop("__base", "__rem", "__seglen", "__segstart")
    )


def _probe_keys(probe: DataFrame, str_col: str, tau: int) -> DataFrame:
    """All substrings of each probe string that could equal a segment of
    an indexed string within edit distance tau: for every candidate
    indexed length ``tl`` in ``[len - tau, len + tau]`` and every segment
    ``i``, the substrings of the segment's exact length whose start is
    within ``+-tau`` of the segment's position (position windows beyond
    the string yield no row). (2*tau+1)^2 * (tau+1) keys per row at most
    — 18 for tau=1, 75 for tau=2."""
    k = tau + 1
    dl = F.explode(F.array(*[F.lit(d) for d in range(-tau, tau + 1)])).alias("__dl")
    di = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__i")
    dp = F.explode(F.array(*[F.lit(d) for d in range(-tau, tau + 1)])).alias("__dp")
    out = (
        probe.select("*", dl)
        .withColumn("__tlen", F.col("__plen") + F.col("__dl"))
        .where(F.col("__tlen") >= k)  # shorter indexed strings take the short path
        .select("*", di)
        .withColumn("__base", F.expr(f"__tlen div {k}"))
        .withColumn("__rem", F.col("__tlen") % k)
        .withColumn(
            "__seglen",
            F.col("__base") + F.when(F.col("__i") < F.col("__rem"), 1).otherwise(0),
        )
        .withColumn(
            "__segstart",
            F.col("__i") * F.col("__base") + F.least(F.col("__i"), F.col("__rem")),
        )
        .select("*", dp)
        .withColumn("__pstart", F.col("__segstart") + F.col("__dp"))
        .where(
            (F.col("__pstart") >= 0)
            & (F.col("__pstart") + F.col("__seglen") <= F.col("__plen"))
        )
        .withColumn("__seg", F.expr(f"substring({str_col}, __pstart + 1, __seglen)"))
    )
    return out.select(*probe.columns, "__i", "__tlen", "__seg").dropDuplicates(
        [c for c in probe.columns if c.startswith("__pid")] + ["__i", "__tlen", "__seg"]
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    tau: int,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(l, r) <= tau``, as
    ``(left_id, right_id, distance)`` — segment-blocked (PassJoin), so
    the pair generator is an equi-join on (segment index, length,
    segment string) and `levenshtein` runs only on candidates.

    Completeness: an optimal alignment of r and s has at most tau
    errors, so at least one of s's tau+1 disjoint segments aligns
    error-free — it appears verbatim in r, with its start displaced by
    at most tau (each error shifts positions by at most one). The probe
    side generates exactly those substrings. Indexed strings shorter
    than tau+1 characters get degenerate (empty) segments; they take a
    separate length-banded equi-join path (any such string is within
    tau of all strings of length <= 2*tau by definition of length
    difference, so the band is the only filter available).

    At 100 TB: both sides shuffle once on the segment key (bounded
    fan-out per row: ~(2*tau+1)^2*(tau+1) probe keys, tau+1 index keys);
    the verify step is a projection. No cartesian path exists.
    Column names must be distinct between the two frames.
    """
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    if {left_id, left_str} & {right_id, right_str}:
        raise ValueError("left and right column names must be distinct; rename first")
    k = tau + 1
    lhs = left.select(
        F.col(left_id), F.col(left_str), F.length(left_str).alias("__plen")
    ).where(F.col(left_str).isNotNull())
    rhs = right.select(
        F.col(right_id), F.col(right_str), F.length(right_str).alias("__tlen")
    ).where(F.col(right_str).isNotNull())

    long_rhs = _segment_keys(rhs.where(F.col("__tlen") >= k), right_str, tau)
    probe = _probe_keys(lhs.withColumnRenamed(left_id, "__pid"), left_str, tau)
    cands = probe.join(long_rhs, ["__i", "__tlen", "__seg"]).select(
        F.col("__pid").alias(left_id), left_str, right_id, right_str
    )

    # Short indexed strings (len <= tau): length-banded equi-join on the
    # probe's already-exploded target lengths — still no cartesian.
    short_rhs = rhs.where(F.col("__tlen") < k)
    lens = lhs.withColumn(
        "__tlen",
        F.explode(F.array(*[F.col("__plen") + F.lit(d) for d in range(-tau, tau + 1)])),
    ).where(F.col("__tlen").between(0, k - 1))
    short_cands = lens.join(short_rhs, "__tlen").select(
        left_id, left_str, right_id, right_str
    )

    return (
        cands.unionByName(short_cands)
        .dropDuplicates([left_id, right_id])
        .withColumn("distance", F.levenshtein(F.col(left_str), F.col(right_str)))
        .where(F.col("distance") <= tau)
        .select(left_id, right_id, "distance")
    )


def edit_distance_self_join(
    df: DataFrame, id_col: str, str_col: str, tau: int
) -> DataFrame:
    """Unordered within-corpus pairs (``id_a < id_b``) within edit
    distance tau, as ``(id_a, id_b, distance)``."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(str_col).alias("str_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(str_col).alias("str_b"))
    return edit_distance_join(a, b, "id_a", "str_a", "id_b", "str_b", tau).where(
        F.col("id_a") < F.col("id_b")
    )
