"""Record linkage / entity resolution: edit-distance similarity joins.

The naive formulation of "find all string pairs within edit distance
tau" is an all-pairs `levenshtein()` cross join — quadratic in the
corpus and a non-starter at 100 TB. `edit_distance_join` blocks
candidates with one of two complete schemes (both reduce the pair
space to blocking-key co-occupancy, never |L| x |R|, and only
candidates pay the `levenshtein` verification):

- FastSS deletion neighborhoods (Bocek et al. 2007) for tau <= 1:
  equi-join on the <=tau-deletion variants of each string — keys carry
  the string's full entropy, so shared-prefix corpora still block well;
- PassJoin segment blocking (Li, Deng, Feng, "PASS-JOIN: a
  partition-based method for similarity joins", VLDB 2011) for
  tau >= 2: by the pigeonhole principle, if ED(r, s) <= tau then at
  least one of the tau+1 disjoint segments of s appears EXACTLY (same
  characters, start position shifted by at most tau) as a substring of
  r — candidates meet through an equi-join on (segment index, indexed
  length, segment string).

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


def _deletion_keys(df: DataFrame, str_col: str, tau: int) -> DataFrame:
    """FastSS deletion-neighborhood keys (Bocek et al., "Fast similarity
    search in large dictionaries", 2007): every variant of the string
    with 0..tau characters deleted. If ED(r, s) <= tau, an optimal
    alignment leaves at most tau positions of each string unmatched;
    deleting them yields the SAME subsequence on both sides, so the two
    deletion neighborhoods intersect — an equi-join on the variant is a
    complete candidate generator. Keys are near-whole strings, so their
    selectivity tracks the corpus's full entropy (no constant-prefix
    hot key, the segment scheme's weakness). Pure JVM: one explode over
    deletion-position combinations + substring concatenation."""
    if tau == 0:
        return df.withColumn("__seg", F.col(str_col))
    # tau == 1: variants = self + one deletion per position
    pos = F.explode(
        F.sequence(F.lit(0), F.length(str_col))
    ).alias("__delpos")  # 0 = keep whole string, i>0 = delete char i
    return df.select("*", pos).withColumn(
        "__seg",
        F.when(F.col("__delpos") == 0, F.col(str_col)).otherwise(
            F.concat(
                F.expr(f"substring({str_col}, 1, __delpos - 1)"),
                F.expr(f"substring({str_col}, __delpos + 1, 2147483647)"),
            )
        ),
    ).drop("__delpos")


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
    ``(left_id, right_id, distance)`` — blocked candidate generation,
    so `levenshtein` runs only on candidates and no all-pairs path
    exists.

    Two complete blocking schemes, chosen by tau:

    - ``tau <= 1``: FastSS deletion neighborhoods — both sides explode
      to their <=tau-deletion variants and candidates meet through an
      equi-join on the variant string. len+1 keys per row, and each key
      carries the string's FULL entropy, so low-entropy corpora
      (constant prefixes: ``Customer#00001...``, URLs sharing a domain)
      still block selectively. The variant fan-out is what caps tau
      here: C(len, tau) keys per row explodes past tau=1-2.
    - ``tau >= 2``: PassJoin segment blocking (Li, Deng, Feng,
      VLDB 2011) — an optimal alignment of r and s has at most tau
      errors, so at least one of s's tau+1 disjoint segments aligns
      error-free: it appears verbatim in r with its start displaced by
      at most tau. Candidates meet through an equi-join on (segment
      index, indexed length, segment string); bounded fan-out
      (~(2*tau+1)^2*(tau+1) probe keys). CAVEAT: a segment falling in a
      constant region of the corpus (shared prefixes) is a hot key
      whose bucket pairs quadratically — prefer higher-entropy key
      columns, or strip known-constant prefixes before joining.

    Indexed strings shorter than tau+1 characters get degenerate
    (empty) segments on the segment path; they take a separate
    length-banded equi-join path. At 100 TB: both sides shuffle once on
    the blocking key; the verify step is a projection. Column names
    must be distinct between the two frames.
    """
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    if {left_id, left_str} & {right_id, right_str}:
        raise ValueError("left and right column names must be distinct; rename first")
    if tau <= 1:
        lhs = left.select(F.col(left_id), F.col(left_str)).where(
            F.col(left_str).isNotNull()
        )
        rhs = right.select(F.col(right_id), F.col(right_str)).where(
            F.col(right_str).isNotNull()
        )
        cands = _deletion_keys(lhs, left_str, tau).join(
            _deletion_keys(rhs, right_str, tau), "__seg"
        )
        return (
            cands.dropDuplicates([left_id, right_id])
            .withColumn("distance", F.levenshtein(F.col(left_str), F.col(right_str)))
            .where(F.col("distance") <= tau)
            .select(left_id, right_id, "distance")
        )
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
