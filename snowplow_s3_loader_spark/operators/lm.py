"""N-gram language-model quality scoring for training-data curation —
the CCNet-style signal: score each document's cross-entropy under a
smoothed bigram model trained on the corpus itself; outlier-high
perplexity marks boilerplate/garbage, outlier-low marks degenerate
repetition. (Beyond the reference's surface — SURVEY.md SS7.8
training-data extensions.)

Model: add-k conditional bigram probabilities,

    P(w2 | w1) = (c(w1 w2) + k) / (ctx(w1) + k * V)

where ctx(w1) counts w1's occurrences as a bigram context (positions
1..len-1) and V is the corpus vocabulary size. Cross-entropy is the
mean negative log-probability over the document's bigrams (nats).

Cross-engine determinism (the oracle hash-compares exact values): each
bigram's log-probability is rounded to integer MICRO-NATS before the
per-document sum, so the aggregation is integer — exact and
order-independent in any engine — and only the final division is float
(IEEE division of exact integers is correctly rounded everywhere). This
is the same integer-accumulation rule the running-revenue query uses
for window sums.

Scale shape: the bigram and context-count relations are two partial+
final hash aggregations over one exploded scan; both are
vocabulary-sized, so their joins back to the per-document bigram stream
are left to AQE (broadcast while the vocabulary fits, shuffle when it
doesn't). No UDFs, no driver-side iteration; V and the corpus are the
only scalars collected (one count-distinct action, like TF-IDF's N).

Token model is shared with operators/text.py (whitespace runs), so the
DuckDB oracle reproduces every count exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.hygiene import word_ngrams
from snowplow_s3_loader_spark.operators.text import tokens


def bigram_lm_scores(
    docs: DataFrame, id_col: str, text_col: str, k: float = 0.5
) -> DataFrame:
    """(id, n_bigrams, sum_logp_micronats, lm_cross_entropy) per document.

    `sum_logp_micronats` is the exact integer sum of per-bigram
    round(ln(P) * 1e6); `lm_cross_entropy` = -sum / (n * 1e6) rounded to
    6 decimals (NULL for documents with fewer than two tokens). Every
    input row appears in the output.
    """
    bg = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("gram"),
    ).withColumn("w1", F.split(F.col("gram"), " ").getItem(0))

    c2 = bg.groupBy("gram").agg(F.count("*").alias("c2"))
    # derived from the distinct-bigram-sized c2 frame, not a third corpus
    # explode — see moore_lewis_scores for the ReuseExchange mechanics
    ctx = (
        c2.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("c2").cast("long").alias("c1"))
    )
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.count_distinct("tok"))
        .first()[0]
    )

    logp = F.log(
        (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.lit(float(vocab)))
    )
    scored = (
        bg.join(c2, "gram")
        .join(ctx, "w1")
        .select("id", F.round(logp * 1e6, 0).cast("long").alias("micro"))
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("micro").alias("sum_logp_micronats"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("sum_logp_micronats").cast("long").alias("sum_logp_micronats"),
        F.round(
            -F.col("sum_logp_micronats")
            / (F.col("n_bigrams").cast("double") * 1e6),
            6,
        ).alias("lm_cross_entropy"),
    )


def moore_lewis_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    k: float = 0.5,
) -> DataFrame:
    """Cross-entropy difference filtering (Moore & Lewis, ACL 2010) —
    the classic intelligent-selection rule DSIR descends from, at word
    granularity: score each raw-pool document by

        ml = sum over its bigrams of [ ln P_target(w2|w1)
                                       - ln P_raw(w2|w1) ]

    with both sides add-k bigram models (the bigram_lm_scores family's
    smoothing; the TARGET model is trained only on the ``is_target``
    slice, the RAW model on the whole pool, and V — the smoothing
    vocabulary — is the shared raw-corpus vocabulary so unseen-in-target
    bigrams fall to the same 1/V-scale floor on a comparable scale).
    Higher ml = more target-like; select by thresholding or a
    distributed top-k downstream.

    Exactness: each bigram's two log-probs quantize to integer
    micro-nats independently (one shared double from identical
    integers — the q142 discipline), so every output is an exact int64
    sum and hash-identical across engines.

    Scale shape: both count tables are vocabulary-sized, joined back
    under AQE (broadcast while the vocabulary fits); one doc-keyed
    aggregation; one count-distinct scalar (V). Documents with fewer
    than two tokens emit n_bigrams=0 and NULL scores (no evidence, not
    zero evidence).

    Output: (id, n_bigrams, sum_logp_target, sum_logp_raw,
    ml_micronats = sum_logp_target - sum_logp_raw).

    Residency: NOTHING is materialized (the round-10 shape
    localCheckpointed the FULL bigram explode — the block-loss hazard
    dsir_weights measured at 20M docs). The explode is deterministic,
    and the four count tables FUSE into two aggregations (count(*) and
    sum(__t) per gram / per context), so the operator is three
    scan+explode passes (gram counts, context counts, scoring join)
    plus the one-scalar vocabulary pass — resilient and storage-free."""
    bg = docs.select(
        F.col(id_col).alias("id"),
        is_target.cast("int").alias("__t"),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("gram"),
    ).withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
    c2 = bg.groupBy("gram").agg(
        F.count("*").alias("c2r"),
        F.sum(F.col("__t").cast("long")).alias("c2t"),
    )
    # ctx(w1) = w1's occurrences as a bigram context = sum of c2 over the
    # grams starting with w1 (tokens never contain spaces, so the split
    # is exact) — derived from the DISTINCT-BIGRAM-sized c2 frame instead
    # of a third full corpus explode. c2's aggregation subtree appears
    # twice in the plan (scoring join build + this re-aggregation) but
    # the physical exchanges are identical, so ReuseExchange computes the
    # corpus-scale pass once (guide §2.4: two operations keyed the same
    # way share one exchange); the operator drops from three corpus
    # explodes to two.
    ctx = (
        c2.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
        .groupBy("w1")
        .agg(
            F.sum("c2r").cast("long").alias("c1r"),
            F.sum("c2t").cast("long").alias("c1t"),
        )
    )
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.count_distinct("tok"))
        .first()[0]
    )
    kv = F.lit(k) * F.lit(float(vocab or 0))
    logp_t = F.log(
        (F.coalesce("c2t", F.lit(0)) + F.lit(k))
        / (F.coalesce("c1t", F.lit(0)) + kv)
    )
    logp_r = F.log((F.col("c2r") + F.lit(k)) / (F.col("c1r") + kv))
    scored = (
        bg.join(c2, "gram")
        .join(ctx, "w1")
        .select(
            "id",
            F.round(logp_t * 1e6, 0).cast("long").alias("mt"),
            F.round(logp_r * 1e6, 0).cast("long").alias("mr"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("mt").alias("sum_logp_target"),
        F.sum("mr").alias("sum_logp_raw"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("sum_logp_target").cast("long").alias("sum_logp_target"),
        F.col("sum_logp_raw").cast("long").alias("sum_logp_raw"),
        (F.col("sum_logp_target") - F.col("sum_logp_raw")).alias(
            "ml_micronats"
        ),
    )
