"""Deduplication operators for training-data pipelines: exact, token-Jaccard,
MinHash+LSH, SimHash (SURVEY.md SS7.8; beyond the reference's surface).

Scale notes (100 TB):
  - exact dedup = hash groupBy on a digest column -> one shuffle keyed by
    digest; AQE handles skew (identical boilerplate docs salt naturally
    because the digest is the key).
  - MinHash/LSH avoids the O(n^2) pair space: candidates only join inside an
    LSH band bucket. The band join is a shuffle on (band_id, band_hash) —
    bounded by bucket sizes, not corpus size.
  - SimHash here uses an explode(tokens x bits) formulation for exact oracle
    parity; at extreme scale swap the per-token bit explode for a vectorized
    pandas_udf computing signatures per Arrow batch (same signature column,
    same downstream joins).

Determinism: every hash is md5 (identical across Spark/DuckDB), never
xxhash64/murmur (engine-specific seeds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.text import tokens


def exact_dedup(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Keep exactly one deterministic representative per key (first by
    order_cols). Distributed: one window shuffle on key_cols."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row digest-dedup summary over a document corpus."""
    return df.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.md5(F.col(text_col).cast("binary"))).alias("n_unique_texts"),
        (F.count("*") - F.count_distinct(F.md5(F.col(text_col).cast("binary")))).alias(
            "n_dup_docs"
        ),
    )


def distinct_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """MinHash signatures banded for LSH.

    h_s(doc) = min over tokens of md5('<s>:' + token) (lexicographic min of
    hex digests — total order identical in any engine). Bands concatenate
    band_size consecutive signature slots.
    Returns (id, band_id, band_hash).
    """
    tok = distinct_tokens(df, id_col, text_col)
    seeded = tok.select(
        "id", "tok", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    )
    hashed = seeded.select(
        "id",
        "seed",
        F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("tok")).cast("binary")).alias("h"),
    )
    sig = hashed.groupBy("id", "seed").agg(F.min("h").alias("mh"))
    banded = sig.withColumn("band_id", (F.col("seed") / band_size).cast("int"))
    return (
        banded.groupBy("id", "band_id")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda s: s["mh"]
                ),
            ).alias("band_hash")
        )
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket.
    Join is co-partitioned on (band_id, band_hash) — never all-pairs."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over pairs sharing a blocking key.

    Inverted-index formulation: pairs materialize only through shared
    (block, token) postings — the classic set-similarity join; no cross
    product. Output: (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.struct(*[F.col(c) for c in block_cols]).alias("blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )
    sizes = base.select("id", "blk", F.size("toks").alias("sz"))
    postings = base.select("id", "blk", F.explode("toks").alias("tok"))
    common = (
        postings.alias("a")
        .join(postings.alias("b"), on=["blk", "tok"])
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def _token_hash60(tok: Column) -> Column:
    """First 60 bits of md5(token) as a non-negative bigint (15 hex chars),
    reproducible in DuckDB via CAST('0x'||substr(md5(t),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")


def simhash60(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document.

    Bit b of the fingerprint is set iff sum over distinct tokens of
    (+1 if bit b of md5-60(token) else -1) > 0. Exact-parity formulation
    (explode tokens x 60 bits); see module docstring for the 100 TB variant.
    Returns (id, simhash).
    """
    tok = distinct_tokens(df, id_col, text_col).withColumn("h", _token_hash60(F.col("tok")))
    bits = tok.select(
        "id", "h", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit")
    ).withColumn(
        # pyspark's F.shiftright wants a literal bit count; the SQL form
        # accepts a column operand
        "vote",
        F.when(F.expr("shiftright(h, bit) & 1") == 1, 1).otherwise(-1),
    )
    return (
        bits.groupBy("id", "bit")
        .agg(F.sum("vote").alias("v"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("simhash")
        )
    )


def simhash60_fast(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Vectorized SimHash — the 100 TB path. Bit-identical to simhash60()
    (same md5-60 token hashes, same vote rule) but computed per Arrow batch
    in numpy instead of exploding tokens x 60 bits through a shuffle:
    zero shuffles, one pass, ~60x less intermediate data."""
    import hashlib

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("id", LongType()), StructField("simhash", LongType())]
    )

    def _batch(pdfs):
        bits = np.arange(60, dtype=np.uint64)
        for pdf in pdfs:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = set(str(text).strip().split())
                votes = np.zeros(60, dtype=np.int64)
                for tok in toks:
                    h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                    tok_bits = (np.uint64(h) >> bits) & np.uint64(1)
                    votes += np.where(tok_bits.astype(bool), 1, -1)
                fp = int(((votes > 0).astype(np.uint64) << bits).sum())
                ids.append(int(doc_id))
                hashes.append(fp)
            yield pd.DataFrame({"id": ids, "simhash": hashes})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(_batch, schema=out_schema)


def hamming60(a: Column, b: Column) -> Column:
    """Hamming distance between two 60-bit simhashes: popcount of xor."""
    return F.bit_count(a.bitwiseXOR(b))
