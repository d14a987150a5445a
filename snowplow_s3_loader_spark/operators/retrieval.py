"""Corpus-statistics relevance scoring for training-data curation: TF-IDF
term extraction and BM25 retrieval. (Beyond the reference's surface —
SURVEY.md SS7.8 training-data extensions.)

Token model is shared with operators/text.py (whitespace runs), so every
result is reproducible in the DuckDB oracle.

Scale shape: one explode + one (doc, term)-keyed aggregation builds the
term-frequency relation; document frequency is a second aggregation over
it keyed by term alone. Both are partial+final hash aggregations; the
tf x df join is keyed on term and left to AQE (vocabulary size at corpus
scale decides broadcast vs shuffle — never forced here). BM25 filters tf
to the literal query terms BEFORE any join, so the expensive relation
never materializes for non-query terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.text import tokens


def term_frequencies(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — one row per document x distinct term."""
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf_top_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    idf = ln((N + 1) / (df + 1)) — the smoothed form, positive for every
    term and identical under DuckDB's ln(). Ranking is deterministic:
    (round(score, 6) DESC, term ASC) so ties cut the same in any engine.
    Returns (id, term, score, rank).
    """
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.count()  # one scalar action; broadcast as a literal
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_rel, "term").select(
        "id",
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "score", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 (Robertson/
    Sparck Jones; the Okapi formulation used by Lucene/Elasticsearch).

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5));
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)).

    Deterministic output: (round(score, 6) DESC, id ASC), rank included.

    ``corpus_stats`` — an optional precomputed ``(n_docs, avgdl)`` pair:
    multi-query callers (query-variant fusion, batch evaluation) compute
    the corpus statistics ONCE via `bm25_corpus_stats` instead of paying
    the two blocking corpus scans per query.
    """
    # duplicated query terms must not double-count; order preserved for the
    # fixed-order summation below
    query_terms = list(dict.fromkeys(query_terms))
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    if corpus_stats:
        n_docs, avgdl = corpus_stats[0], corpus_stats[1]
    else:
        # ONE corpus pass for both scalars (round 14): the former
        # count-then-avg shape paid two blocking scans — the count's
        # column-pruned pass was cheap but still a full scheduler
        # round-trip, and the avg re-tokenized from scratch
        [stats_row] = base.agg(
            F.count("*").alias("n"), F.avg(F.size("toks")).alias("ad")
        ).collect()
        n_docs, avgdl = int(stats_row["n"]), stats_row["ad"]
    if not query_terms or n_docs == 0:
        # empty query or empty corpus: a well-typed empty result, not a crash
        return base.limit(0).select(
            "id",
            F.lit(0.0).alias("score"),
            F.lit(0).alias("rank"),
        )
    tf = (
        base.select("id", F.explode("toks").alias("term"))
        # literal IN-filter runs before the aggregation: only query terms
        # ever reach the shuffle
        .where(F.col("term").isin(*query_terms))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = base.select("id", F.size("toks").alias("dl"))
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(df_rel, "term")
        .join(dl, "id")
        .select(
            "id",
            "term",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("s"),
        )
    )
    # FIXED-ORDER addition over the query terms (one conditional sum per
    # term, each over at most one row): float addition is not associative,
    # so a plain sum() would hash-diverge across engines/partitionings
    term_sums = [
        F.coalesce(F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0))
        for t in query_terms
    ]
    total = term_sums[0]
    for ts in term_sums[1:]:
        total = total + ts
    scored = per_term.groupBy("id").agg(F.round(total, 6).alias("score"))
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    # global top-k: fine for k ~ 10s (TakeOrderedAndProject, no full sort);
    # the rank column is attached AFTER the limit so no unpartitioned
    # window ever sees the full corpus
    top = scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
    return top.withColumn("rank", F.row_number().over(w))


def bm25_corpus_stats(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[int, float]:
    """``(n_docs, avgdl)`` for `bm25_topk`'s ``corpus_stats`` — ONE
    aggregation pass shared across any number of query evaluations."""
    row = docs.select(
        F.count("*").alias("n"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("avgdl"),
    ).first()
    return int(row["n"]), row["avgdl"]


def inverted_index(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional inverted index: one (term, id, pos) posting per token
    occurrence (0-based position) — the retrieval-infrastructure twin
    of `bm25_topk`'s scoring path. Built with a single posexplode; at
    rest, write it partitioned/sorted by term so phrase and boolean
    queries prune to their terms' postings at the scan."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    ).select("term", "id", "pos")


def phrase_search(postings: DataFrame, phrase: str) -> DataFrame:
    """Exact phrase query over a positional index: documents containing
    the phrase's tokens at consecutive positions, with the exact
    occurrence count. Classic intersection plan with STATISTICS-DRIVEN
    join order (the Spark-first touch): the per-term posting counts —
    one tiny aggregation over <= len(phrase) terms — pick the RAREST
    term as the probe side, so every subsequent equi-join on
    (id, aligned position) intersects against the smallest candidate
    set first; join order never changes the result, only the work.

    Returns (id, n_matches), n_matches >= 1. Single-term phrases reduce
    to the term's posting counts. Scale shape: k-1 equi-joins between
    posting slices that a term-partitioned index prunes at the scan;
    no join ever touches more than one term's postings per side."""
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    slices = [
        postings.where(F.col("term") == t).select(
            F.col("id"), (F.col("pos") - i).alias("anchor")
        )
        for i, t in enumerate(terms)
    ]
    if len(terms) == 1:
        base = slices[0]
    else:
        # rarest-first probe order from ONE statistics pass: per-term
        # posting counts for just the phrase's terms (missing terms
        # count 0 and still sort first — the join then proves emptiness
        # immediately)
        counts = {
            r["term"]: r["n"]
            for r in postings.where(F.col("term").isin(list(set(terms))))
            .groupBy("term")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        order = sorted(range(len(terms)), key=lambda i: (counts.get(terms[i], 0), i))
        base = slices[order[0]]
        for i in order[1:]:
            base = base.join(slices[i], ["id", "anchor"])
    return base.groupBy("id").agg(F.count("*").alias("n_matches"))


def reciprocal_rank_fusion(
    rankings: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k0: int = 60,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    combine N ranked lists into one by ``sum over lists of
    1 / (k0 + rank)`` — the standard lexical+semantic / multi-query
    hybrid-retrieval merge, famously robust to score-scale mismatch
    because it reads only the RANKS. Scored in truncating integer
    micro-units (``scale div (k0 + rank)``) so the fused order is
    engine-exact; ties break to the lowest id. Returns
    (id, n_lists, rrf_micro, fused_rank).

    Scale shape: the candidate set is bounded by the SUM of the input
    lists' lengths (each list is already a top-k), so the union, the
    id-keyed aggregation, and the final ranking window all run on a
    k-scale frame — the unpartitioned row_number is over that bounded
    set, never a corpus."""
    if not rankings:
        raise ValueError("reciprocal_rank_fusion: need at least one ranking")
    if k0 < 0:
        raise ValueError(f"k0 must be >= 0, got {k0}")
    tagged = None
    for r in rankings:
        part = r.select(
            F.col(id_col).alias("id"), F.col(rank_col).cast("long").alias("rank")
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    # a null or sub-1 rank would silently null this id's fused score
    # (sum absorbs nulls) or divide by zero — both are corrupt inputs,
    # not rankings; fail loudly instead
    tagged = tagged.withColumn(
        "rank",
        F.when(
            F.col("rank").isNull() | (F.col("rank") < 1),
            F.raise_error(
                F.lit("reciprocal_rank_fusion: ranks must be 1-based ints")
            ).cast("long"),
        ).otherwise(F.col("rank")),
    )
    fused = tagged.groupBy("id").agg(
        F.count("*").alias("n_lists"),
        F.sum(F.expr(f"{int(scale)} div ({int(k0)} + rank)")).alias(
            "rrf_micro"
        ),
    )
    w = Window.orderBy(F.desc("rrf_micro"), F.asc("id"))
    return fused.withColumn("fused_rank", F.row_number().over(w))
