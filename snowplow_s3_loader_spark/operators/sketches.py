"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters.

(Beyond the reference's surface — SURVEY.md SS7.8 scale extensions.)

Corpus-wide frequent-token discovery is the building block behind
stopword induction, boilerplate detection, and vocabulary pruning. The
exact answer is one `groupBy(token).count()` — a shuffle whose map-side
combine state is the full distinct-token vocabulary. At 100 TB web scale
the vocabulary (URLs, hashes, typos) is itself huge; the standard fix is
a bounded-memory mergeable summary per partition.

This module implements Misra-Gries summaries with the merge rule of
Agarwal et al., "Mergeable Summaries" (PODS 2012): each partition keeps
at most `capacity` counters (numpy-compacted: merge a batch Counter,
then subtract the (capacity+1)-largest count and drop non-positives);
partial summaries merge by summing counters per token. The merged
estimate `est` of every token satisfies

    true_count - n_total / (capacity + 1)  <=  est  <=  true_count

so every token with true frequency above n_total/(capacity+1) is
guaranteed present in the merged summary (the classic MG guarantee,
preserved under merging).

Scale shape: the token stream never shuffles — each partition reduces to
<= capacity rows inside mapInPandas (Arrow-batched; the per-batch work is
a C-speed Counter + one numpy partition/compact), and only the tiny
candidate sets shuffle into the final per-token sum. Python is justified
here exactly because the JVM path (hash aggregate) cannot bound its
state; the transfer is one string column.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.text import tokens


def _mg_compact(state: Counter, capacity: int) -> Counter:
    """Batch-decrement MG compaction: subtract the (capacity+1)-largest
    count from every counter and drop the non-positive ones. At least
    capacity+1 counters carry >= the subtracted value, so each compaction
    removes >= (capacity+1)*thresh stream mass — total error stays under
    n/(capacity+1). Shared by the batch summary and the streaming twin."""
    if len(state) <= capacity:
        return state
    import numpy as np

    toks = np.array(list(state.keys()), dtype=object)
    vals = np.fromiter(state.values(), dtype=np.int64, count=len(state))
    thresh = np.partition(vals, -(capacity + 1))[-(capacity + 1)]
    keep = vals > thresh
    return Counter(dict(zip(toks[keep], (vals[keep] - thresh).tolist())))


def _mg_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """One Misra-Gries summary per partition: merge each Arrow batch's
    Counter, compact to `capacity` counters (error accrues only through
    compaction subtractions, which total <= n_partition/(capacity+1))."""
    state: Counter = Counter()
    for pdf in batches:
        state.update(Counter(pdf["tok"].to_numpy()))
        state = _mg_compact(state, capacity)
    if state:
        yield pd.DataFrame(
            {"token": list(state.keys()), "partial": list(state.values())}
        )


def mg_token_summary(
    df: DataFrame, text_col: str, capacity: int = 1024
) -> DataFrame:
    """(token, est_count) merged Misra-Gries summary of the corpus token
    stream — at most `capacity` rows per input partition ever leave the
    executors, independent of vocabulary size."""
    if capacity < 1:
        raise ValueError(f"capacity ({capacity}) must be >= 1")
    tok_df = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    partials = tok_df.mapInPandas(
        lambda it: _mg_partition(it, capacity), schema="token string, partial long"
    )
    return partials.groupBy("token").agg(F.sum("partial").alias("est_count"))


def heavy_hitters(
    df: DataFrame, text_col: str, capacity: int = 1024, k: int = 20
) -> DataFrame:
    """Top-k frequent tokens by merged-MG estimate, with the deterministic
    error bound attached: (token, est_count, err_bound) where
    err_bound = floor(n_total / (capacity+1)) and
    est_count <= true_count <= est_count + err_bound. Note est_count
    (and therefore the ranking) depends on the input partitioning —
    callers needing reproducible ranks use heavy_hitter_audit (which
    checks the sketch against the exact counts) or the exact groupBy."""
    summary = mg_token_summary(df, text_col, capacity)
    n_total = df.select(F.sum(F.size(tokens(F.col(text_col)))).alias("n")).collect()[
        0
    ]["n"] or 0
    err = int(n_total) // (capacity + 1)
    return (
        summary.orderBy(F.desc("est_count"), "token")
        .limit(k)
        .select("token", "est_count", F.lit(err).cast("long").alias("err_bound"))
    )


def heavy_hitter_audit(
    df: DataFrame, text_col: str, capacity: int = 1024, k: int = 20
) -> DataFrame:
    """FALSIFIABLE invariant rows for the sketch (the q37/q48 pattern):
    for each of the exact top-k tokens (by exact count, ties by token),
    emit

        (token, exact_count, found, bound_ok)

    where found = 1 iff the token is present in the merged MG summary
    (guaranteed whenever exact_count > n_total/(capacity+1)) and
    bound_ok = 1 iff exact - err <= est <= exact. The oracle recomputes
    token/exact_count exactly and emits literal 1s: a sketch that loses
    a guaranteed heavy hitter, or whose estimate leaves the MG interval,
    flips a 0 into the hashed columns and fails the hash. Tokens at or
    below the guarantee threshold n_total/(capacity+1) are excluded from
    the audit (the MG guarantee doesn't cover them).
    """
    tok_df = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    exact = tok_df.groupBy("tok").agg(F.count("*").alias("exact_count"))
    n_total = df.select(F.sum(F.size(tokens(F.col(text_col)))).alias("n")).collect()[
        0
    ]["n"] or 0
    err = int(n_total) // (capacity + 1)
    topk = (
        exact.orderBy(F.desc("exact_count"), "tok")
        .limit(k)
        .filter(F.col("exact_count") > F.lit(err))
    )
    summary = mg_token_summary(df, text_col, capacity)
    return audit_flags(topk, summary, err)


def audit_flags(exact_topk: DataFrame, summary: DataFrame, err: int) -> DataFrame:
    """The audit's flag logic, factored out so its FALSIFIABILITY is
    directly testable with planted-wrong summaries (a dropped heavy
    token flips found, an inflated/deflated estimate flips bound_ok):
    exact_topk has (tok, exact_count), summary has (token, est_count)."""
    joined = exact_topk.join(summary, exact_topk.tok == summary.token, "left")
    return joined.select(
        F.col("tok").alias("token"),
        "exact_count",
        F.col("est_count").isNotNull().cast("int").alias("found"),
        (
            F.col("est_count").isNotNull()
            & (F.col("est_count") <= F.col("exact_count"))
            & (F.col("est_count") >= F.col("exact_count") - F.lit(err))
        ).cast("int").alias("bound_ok"),
    )


def cms_hash(tok, row, width: int):
    """Count-Min cell for one token under hash row ``row``: first 15 hex
    chars of md5('<row>|<token>') as a 60-bit integer, mod width — the
    engine-portable hash family the MinHash/split/feature-hash operators
    already use (DuckDB: ``CAST('0x'||substr(md5(...),1,15) AS BIGINT)``),
    so a sketch built here is reproducible CELL FOR CELL in SQL."""
    salted = F.concat(row.cast("string"), F.lit("|"), tok)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame, token_col: str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, "An improved data
    stream summary: the count-min sketch and its applications", 2005)
    over a token stream: ``depth x width`` counters as a
    ``(row, cell, n)`` frame (absent cells are zero; keep depth*width
    within broadcast size — ~10M cells — since `cms_query` broadcasts
    the sketch). Point estimates
    via `cms_query` satisfy ``true <= est`` always and
    ``est <= true + e/width * N`` with probability ``1 - e^-depth`` per
    query (N = stream size) — the fixed-size frequency summary for
    vocabularies too large to count exactly, and it MERGES: sketches of
    two corpus shards with the same (width, depth) combine by summing
    cells (`cms_merge`).

    Scale shape: pure JVM — one explode of the token stream across the
    ``depth`` hash rows, then a partial+final count keyed on (row, cell).
    Map-side combine collapses every partition to at most depth*width
    rows before the shuffle, so the exchanged bytes are BOUNDED by the
    sketch size regardless of corpus size (the same reason the exact
    groupBy is unbounded is the reason this isn't).
    """
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("row")
    tok = F.col(token_col)
    return (
        df.select(tok.alias("__tok"))
        .where(F.col("__tok").isNotNull())
        .select("__tok", rows)
        .select("row", cms_hash(F.col("__tok"), F.col("row"), width).alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count("*").alias("n"))
    )


def cms_build_weighted(
    df: DataFrame,
    token_col: str,
    weight_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch from a PRE-AGGREGATED ``(token, weight)`` frame —
    bit-identical to `cms_build` over the expanded stream (each token's
    weight lands in the same (row, cell) its occurrences would), for
    callers that already hold per-token counts.

    Scale shape: the ``depth``-way explode and the md5 hashing run over
    |vocabulary| rows instead of |stream| rows — when the exact counts
    are being computed anyway (e.g. a sketch-vs-truth audit), the
    corpus is tokenized and aggregated ONCE and the sketch costs only a
    vocabulary-sized pass on top."""
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("row")
    return (
        df.select(
            F.col(token_col).alias("__tok"), F.col(weight_col).alias("__w")
        )
        .where(F.col("__tok").isNotNull())
        .select("__tok", "__w", rows)
        .select(
            "row",
            cms_hash(F.col("__tok"), F.col("row"), width).alias("cell"),
            "__w",
        )
        .groupBy("row", "cell")
        .agg(F.sum("__w").alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two sketches built with the same (width, depth): cells
    sum (the CMS merge property — estimates over the union keep both
    guarantees)."""
    return (
        a.unionByName(b).groupBy("row", "cell").agg(F.sum("n").alias("n"))
    )


def cms_query(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str,
    width: int,
    depth: int,
) -> DataFrame:
    """Point-frequency estimates for every token in ``queries``:
    ``est = min`` over the ``depth`` rows of that token's cell count
    (0 for absent cells). The sketch is at most depth*width rows, so it
    BROADCASTS — the query stream never shuffles for the lookup; the
    only exchange is the per-token min aggregation (which also dedupes
    repeated query tokens — no separate distinct pass)."""
    q = (
        queries.select(F.col(token_col).alias("token"))
        .where(F.col("token").isNotNull())
        .select(
            "token",
            F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("row"),
        )
        .select(
            "token", "row", cms_hash(F.col("token"), F.col("row"), width).alias("cell")
        )
    )
    return (
        q.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_n"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------

_KMV_M = 1 << 48  # 48-bit hash space: see kmv_build


def _kmv_hash(col) -> F.Column:
    """Engine-portable uniform 48-bit hash: leading 12 md5 hex chars.
    DuckDB replays it as CAST('0x' || substr(md5(v), 1, 12) AS BIGINT).
    48 bits keeps every estimator intermediate ((k-1) * (M mod h_k))
    inside int64 for k up to ~32k; the ~n^2/2^49 collision odds this
    costs are noise next to the 1/sqrt(k) estimator error."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_build(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 256
) -> DataFrame:
    """KMV distinct-count sketch per group (Bar-Yossef et al. 2002;
    Beyer et al., "On synopses for distinct-value estimation under
    multiset operations", SIGMOD 2007): the ``k`` smallest distinct
    48-bit hashes of ``value_col``. DETERMINISTIC — no rng state, no
    partitioning sensitivity — so sketches, merges, and estimates
    hash-match an independent SQL replay bit for bit (unlike HLL, whose
    q37 audit is invariant-only). Mergeable: see kmv_merge.

    Scale shape: one distinct on (group, hash) — map-side combine
    bounds the exchanged rows by the distinct-value count — then the
    rank <= k filter rides Spark's WindowGroupLimit pushdown (the q73
    reservoir shape): each task keeps only its local top-k before the
    per-group sort, so no task ever holds a group's full hash set.

    Output: (group_cols..., rnk, h) with rnk in [1, k]."""
    if k < 2:
        raise ValueError(f"kmv_build: k must be >= 2, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.select(*group_cols, _kmv_hash(F.col(value_col)).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Merge two KMV sketches built with the same hash (union the hash
    sets, keep the k smallest per group) — the union bound means a
    merged sketch EQUALS the sketch of the unioned input, so shard
    sketches combine without revisiting either shard (proven by the
    merged-halves == full-rebuild oracle bit in q136)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        a.select(*group_cols, "h")
        .union(b.select(*group_cols, "h"))
        .distinct()
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: exact count when the
    group has fewer than k distinct hashes (the sketch IS the value
    set), else the unbiased (k-1) * M / h_k evaluated in pure int64 —
    (k-1)*q + ((k-1)*r) div h_k with q = M div h_k, r = M mod h_k, an
    exact integer identity for floor((k-1)*M/h_k), so both engines
    agree bit for bit. Relative error concentrates at ~1/sqrt(k).

    Output: (group_cols..., kmv_n, kmv_est) where kmv_n is the sketch
    size actually held."""
    kth = F.max(F.when(F.col("rnk") == k, F.col("h"))).alias("kth")
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("kmv_n"), kth
    )
    return agg.select(
        *group_cols,
        "kmv_n",
        F.when(F.col("kmv_n") < k, F.col("kmv_n"))
        .otherwise(
            F.lit(k - 1) * F.expr(f"{_KMV_M} div kth")
            + F.expr(f"(({k - 1} * ({_KMV_M} % kth)) div kth)")
        )
        .cast("long")
        .alias("kmv_est"),
    )
