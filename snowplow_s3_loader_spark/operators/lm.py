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

Scale shape: one partial+final hash aggregation over one exploded scan
builds the bigram counts, and the context counts ride that
vocabulary-sized aggregate as a window sum partitioned by the context
token (round 14 — never a second traversal of the corpus explode); the
single join back to the per-document bigram stream is left to AQE
(broadcast while the vocabulary fits, shuffle when it doesn't). No
UDFs, no driver-side iteration; V and the corpus are the only scalars
collected (one count-distinct action, like TF-IDF's N).

Token model is shared with operators/text.py (whitespace runs), so the
DuckDB oracle reproduces every count exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    )

    c2 = bg.groupBy("gram").agg(F.count("*").alias("c2"))
    # ctx(w1) rides the c2 frame ITSELF as a window sum over the grams
    # sharing a context, instead of a separate groupBy(w1) relation
    # joined back (round 14): the joined shape made the c2 aggregation
    # subtree a child of TWO join branches, and in Spark 4.1 AQE cannot
    # reuse an exchange above a cached table (TableCacheQueryStageExec
    # canonicalizes with its stage id), so the "derived, not a third
    # corpus explode" claim of round 13 silently re-ran the whole
    # c2 subtree — the executed q148-family plan carried 3 GenerateExec
    # corpus explodes. With the window there is exactly ONE consumer of
    # c2, no reuse needed: two corpus explodes by construction, and the
    # window moves only the vocabulary-sized aggregate (hash(w1)
    # exchange + in-partition sum — ctx groups are bounded by the
    # grams-per-context vocabulary, never corpus-sized). Gated by
    # test_plans.py::test_q148_ctx_rides_c2_no_third_corpus_explode.
    c2x = (
        c2.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
        .withColumn(
            "c1",
            F.sum("c2").over(Window.partitionBy("w1")).cast("long"),
        )
    )
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.count_distinct("tok"))
        .first()[0]
    )

    logp = F.log(
        (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.lit(float(vocab)))
    )
    # the per-bigram micro-nat score is a function of the GRAM alone, so
    # it quantizes ONCE per distinct gram on the vocabulary-sized frame
    # (identical integer inputs -> identical IEEE double -> identical
    # rounding, so every occurrence gets the same value it computed
    # per-row before); the scoring join then carries exactly one long —
    # the narrowest possible broadcast/shuffle payload (guide §2.3), and
    # the log/round work drops from per-occurrence to per-distinct-gram
    per_gram = c2x.select(
        "gram", F.round(logp * 1e6, 0).cast("long").alias("micro")
    )
    scored = bg.join(per_gram, "gram").select("id", "micro")
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

    Scale shape: the one count table is vocabulary-sized (context sums
    ride it as a window — see the c2x note below), joined back under
    AQE (broadcast while the vocabulary fits); one doc-keyed
    aggregation; one count-distinct scalar (V). Documents with fewer
    than two tokens emit n_bigrams=0 and NULL scores (no evidence, not
    zero evidence).

    Output: (id, n_bigrams, sum_logp_target, sum_logp_raw,
    ml_micronats = sum_logp_target - sum_logp_raw).

    Residency: NOTHING is materialized (the round-10 shape
    localCheckpointed the FULL bigram explode — the block-loss hazard
    dsir_weights measured at 20M docs). The explode is deterministic,
    and the four count tables FUSE into one aggregation plus a window
    (count(*) and sum(__t) per gram, context sums per w1 over the
    aggregate), so the operator is two scan+explode passes
    (gram counts, scoring join)
    plus the one-scalar vocabulary pass — resilient and storage-free."""
    bg = docs.select(
        F.col(id_col).alias("id"),
        is_target.cast("int").alias("__t"),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("gram"),
    )
    c2 = bg.groupBy("gram").agg(
        F.count("*").alias("c2r"),
        F.sum(F.col("__t").cast("long")).alias("c2t"),
    )
    # ctx(w1) = w1's occurrences as a bigram context = sum of c2 over the
    # grams starting with w1 (tokens never contain spaces, so the split
    # is exact) — computed as a WINDOW SUM over the distinct-bigram-sized
    # c2 frame itself, never a third corpus pass. Round 13 derived ctx
    # as a second aggregation over c2 and relied on ReuseExchange to
    # dedup the shared subtree; that reuse cannot fire in Spark 4.1 AQE
    # above a cached table (TableCacheQueryStageExec canonicalizes with
    # its stage id), so the c2 subtree — explode and all — silently ran
    # twice. The window keeps ONE consumer of c2 (structural, no
    # planner reliance): two corpus explodes total, and the window's
    # hash(w1) exchange moves only the vocabulary-sized aggregate.
    c2x = c2.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
    ctx_win = Window.partitionBy("w1")
    c2x = c2x.withColumn(
        "c1r", F.sum("c2r").over(ctx_win).cast("long")
    ).withColumn("c1t", F.sum("c2t").over(ctx_win).cast("long"))
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
    # both micro-nat scores are functions of the GRAM alone: quantize
    # once per distinct gram on the vocabulary-sized frame (identical
    # integer inputs -> identical IEEE doubles -> identical rounding)
    # and join back just (gram, mt, mr) — the narrowest broadcast
    # payload, and per-occurrence log/round work drops to per-gram
    per_gram = c2x.select(
        "gram",
        F.round(logp_t * 1e6, 0).cast("long").alias("mt"),
        F.round(logp_r * 1e6, 0).cast("long").alias("mr"),
    )
    scored = bg.join(per_gram, "gram").select("id", "mt", "mr")
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
