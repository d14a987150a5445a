"""DSIR — Data Selection with Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): score every raw-pool document by how much more likely
its hashed n-gram bag is under a TARGET distribution than under the
raw-pool distribution, then keep the top-weighted documents. This is
the standard cheap proxy for "select web text that looks like my
high-quality target corpus" at pretraining scale — the hashed bag
models need only two bounded count tables, never a trained classifier.

Model (the paper's bag-of-hashed-ngrams): unigrams and bigrams hash
into ``n_buckets`` buckets; each side (target / raw) is a bucket
multinomial with add-1 smoothing,

    p(b) = (c_b + 1) / (N + B)

and a document's importance weight is the log-likelihood ratio of its
feature OCCURRENCES:

    w(doc) = sum over occurrences of [ ln p_target(b) - ln p_raw(b) ]

Cross-engine exactness (the q142/q129 discipline): each bucket's two
log-probs are quantized to integer micro-nats — round(ln((c+1)/(N+B))
* 1e6), one shared double built from identical integers — so the
per-document weight is an exact int64 sum and hash-identical across
engines. The hash is the repo's portable md5 family: bucket =
(60-bit md5 prefix) % n_buckets, reproduced verbatim in DuckDB via
CAST('0x' || substr(md5(g), 1, 15) AS BIGINT).

Scale shape at 100 TB:
  - the corpus is exploded ONCE into (doc_id, is_target, bucket)
    feature occurrences (one concat of the unigram and bigram arrays,
    one explode) and eagerly checkpointed — it feeds the two count
    aggregations and the scoring join (the global_row_number
    multi-consumer discipline);
  - both models are <= n_buckets rows (bounded by the MODEL, not the
    data) built over a spark.range spine, so every bucket exists and
    the scoring join is a BROADCAST of a B-row diff table;
  - scoring is one broadcast join + one doc-keyed aggregation;
  - selection is a distributed top-k (orderBy().limit() ->
    TakeOrderedAndProject), never a global rank window.

Reference behavior cited for parity: Xie et al. 2023 §2-3 (hashed
n-gram features, smoothed bag models, importance log-ratio); no
reference-repo counterpart — the reference is a streaming loader
(Processing.scala) with no data-selection surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.hygiene import word_ngrams
from snowplow_s3_loader_spark.operators.text import tokens


def ngram_bucket(gram: Column, n_buckets: int) -> Column:
    """Portable feature hash: 60-bit md5 prefix mod n_buckets (both
    engines compute the identical bucket; the value is non-negative so
    % and pmod agree)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def hashed_features(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(doc_id, extra_cols..., bucket) — one row per unigram AND bigram
    occurrence, hashed into n_buckets. One scan, one explode (the
    unigram and bigram arrays concat before exploding); empty-string
    tokens (blank documents) are dropped."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    text = F.col(text_col)
    grams = F.concat(
        F.filter(tokens(text), lambda t: t != ""),
        word_ngrams(text, 2),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in (extra_cols or [])],
        F.explode(grams).alias("__g"),
    ).select(
        "doc_id",
        *(extra_cols or []),
        ngram_bucket(F.col("__g"), n_buckets).alias("bucket"),
    )


def dsir_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = 1024,
) -> DataFrame:
    """Importance weight per document: (doc_id, n_feats, weight_micro)
    with weight_micro the exact int64 sum over the document's feature
    occurrences of the quantized log-ratio micro-nats. ``is_target``
    marks the documents defining the target distribution (they are
    scored too — useful as a sanity band: targets should score high).
    Documents with no features (blank text) are ABSENT from the output
    (no bag, no likelihood — filter or route them upstream).

    Residency: NOTHING is materialized. The exploded feature stream is
    deterministic (md5 bucketing — no sampling), so its two consumers
    (the count pass and the scoring pass) agree by construction; the
    round-10 shape localCheckpointed the FULL explode and the repo's
    own 20M-doc measurement LOST checkpoint blocks under heap pressure
    ("Block rdd_N does not exist" — the non-resilient-block failure
    mode). Both count tables AND both totals come from ONE aggregation
    over the explode (count(*) and sum(__t) per bucket; totals are the
    k-row frame's own sums), so the whole operator is two scan+explode
    passes and one broadcast join — resilient and storage-free at any
    scale."""
    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.cast("int").alias("__t"),
        F.col(text_col).alias("__txt"),
    )
    feats = hashed_features(base, "doc_id", "__txt", n_buckets, ["__t"])
    counts = feats.groupBy("bucket").agg(
        F.count("*").alias("cr"),
        F.sum(F.col("__t").cast("long")).alias("ct"),
    )
    totals = counts.agg(
        F.sum("ct").alias("NT"),
        F.sum("cr").alias("NR"),
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    model = (
        spine.join(F.broadcast(counts), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.round(
                    F.log(
                        (F.coalesce("ct", F.lit(0)) + 1).cast("double")
                        / (F.col("NT") + n_buckets).cast("double")
                    )
                    * 1_000_000,
                    0,
                ).cast("long")
                - F.round(
                    F.log(
                        (F.coalesce("cr", F.lit(0)) + 1).cast("double")
                        / (F.col("NR") + n_buckets).cast("double")
                    )
                    * 1_000_000,
                    0,
                ).cast("long")
            ).alias("__diff"),
        )
    )
    return (
        feats.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("__diff").alias("weight_micro"),
        )
    )


def dsir_select(weights: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k selection over dsir_weights output: the k
    highest-weighted documents under the total order (weight_micro
    DESC, doc_id) — a distributed top-k (TakeOrderedAndProject), never
    a global rank window. The paper adds Gumbel noise for a soft
    sample; the deterministic argmax-k is the reproducible variant
    (add a seeded md5-derived tiebreak upstream for a randomized mix —
    the q58 hash-order discipline composes)."""
    if k < 1:
        raise ValueError(f"dsir_select: k must be >= 1, got {k}")
    return weights.orderBy(F.desc("weight_micro"), "doc_id").limit(k)
