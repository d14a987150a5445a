"""Worked example: the EMBEDDING-SPACE analytics surface — the health
checks and organization steps a training-data pipeline runs over an
embedding corpus before committing to expensive downstream work.

  1. exact-integer Lloyd k-means (organize the corpus into cells —
     the IVF / SemDeDup / topic-bucketing primitive)
  2. one-pass covariance moments -> driver-eigen PCA -> broadcast
     projection (dimensionality health: is variance concentrated?)
  3. per-label scatter-trace diagnostics (label collapse / separation)
  4. hybrid retrieval: two BM25 query variants fused by integer-exact
     reciprocal-rank fusion
  5. PMI collocation mining over the documents corpus

Run:  PYTHONPATH=. python examples/embedding_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.clustering import (
    covariance_moments,
    kmeans,
    label_scatter,
    pca_components,
    pca_project,
)
from snowplow_s3_loader_spark.operators.retrieval import (
    bm25_corpus_stats,
    bm25_topk,
    reciprocal_rank_fusion,
)
from snowplow_s3_loader_spark.operators.text import collocations
from snowplow_s3_loader_spark.session import get_spark
from snowplow_s3_loader_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="embedding-analytics")
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    print("== k-means cells (k=4, 2 Lloyd rounds, exact integers) ==")
    assigned, cents = kmeans(emb, "vec_id", "embedding", k=4, n_iter=2)
    assigned.groupBy("cluster").agg(
        F.count("*").alias("n"), F.min("dist2"), F.max("dist2")
    ).orderBy("cluster").show()

    print("== covariance of the leading 8 dims -> top-2 PCA components ==")
    rows = covariance_moments(emb, "embedding", dims=8).collect()
    vals, comps = pca_components(rows, dims=8, n_components=2)
    print("explained (top-2 eigenvalues):", [round(v, 2) for v in vals])
    pca_project(emb.select("vec_id", "embedding"), "embedding", comps).select(
        "vec_id", F.round("pc1", 4).alias("pc1"), F.round("pc2", 4).alias("pc2")
    ).show(5)

    print("== per-label scatter trace (collapse/separation check) ==")
    label_scatter(emb, "label", "embedding").orderBy("label").show()

    print("== hybrid search: BM25 variants fused by RRF ==")
    stats = bm25_corpus_stats(docs, "doc_id", "text")
    ra = bm25_topk(
        docs, "doc_id", "text", ["spark", "query"], k=10, corpus_stats=stats
    )
    rb = bm25_topk(
        docs, "doc_id", "text", ["join", "fast"], k=10, corpus_stats=stats
    )
    reciprocal_rank_fusion([ra, rb]).orderBy("fused_rank").show(10)

    print("== PMI collocations (top adjacent bigrams by lift) ==")
    collocations(docs, "text", min_count=5, k=10).orderBy("rnk").show()
    spark.stop()


if __name__ == "__main__":
    main()
