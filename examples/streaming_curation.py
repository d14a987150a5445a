"""Worked example: STREAMING training-data curation — the always-on twin
of examples/curation_pipeline.py. Documents arrive as micro-batches and
the pipeline maintains, with bounded keyed state:

  1. streaming near-duplicate filtering (SimHash-band keyed state,
     first-seen wins across batches and RESTARTS — streaming/stateful.py)
  2. streaming heavy-hitter tracking (sharded Misra-Gries state — the
     induced-stopword monitor that never holds the full vocabulary)
  3. per-batch hygiene + quality scoring (pure column expressions)
  4. append of the curated survivors to parquet

Run:  PYTHONPATH=. python examples/streaming_curation.py
(writes its own two-batch corpus under a temp dir, then drains each
batch with an availableNow trigger — the second drain resumes both
queries from their checkpoints, exactly how an always-on deployment
restarts)
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.hygiene import pii_counts, redact_pii
from snowplow_s3_loader_spark.operators.text import quality_score, tokens
from snowplow_s3_loader_spark.session import get_spark
from snowplow_s3_loader_spark.streaming.stateful import (
    enable_rocksdb_state_store,
    near_dup_keep_filter,
    streaming_heavy_hitters,
    streaming_near_dup_votes,
)

SCHEMA = "id long, text string"


def main() -> None:
    spark = get_spark(app_name="streaming-curation", master="local[4]")
    enable_rocksdb_state_store(spark)
    root = Path(tempfile.mkdtemp(prefix="stream_curation_"))
    in_dir, out_dir = root / "in", root / "curated"
    ckpt_dedup, ckpt_hh = root / "ckpt_dedup", root / "ckpt_hh"
    in_dir.mkdir(parents=True)

    kept_counts: list[tuple[int, int]] = []
    summaries: dict = {}

    def curate(votes_batch, batch_id):
        """foreachBatch: votes -> keep flags -> re-join text -> hygiene ->
        parquet append. The inner join restricts to THIS batch's ids, so
        earlier batches are never re-curated."""
        keeps = near_dup_keep_filter(votes_batch).filter(F.col("keep"))
        texts = (
            votes_batch.sparkSession.read.schema(SCHEMA)
            .option("sep", "\t")
            .csv(str(in_dir))
        )
        n_emails, n_ips, n_cards = pii_counts(F.col("text"))
        curated = texts.join(keeps, "id", "inner").select(
            "id",
            redact_pii(F.col("text")).alias("text"),
            F.round(quality_score(F.col("text")), 4).alias("quality"),
            (n_emails + n_ips + n_cards).alias("n_pii_spans"),
        )
        curated.write.mode("append").parquet(str(out_dir))
        kept_counts.append((batch_id, curated.count()))

    def track(batch_df, batch_id):
        for r in batch_df.collect():
            summaries.setdefault(r["shard"], {})[r["token"]] = r["est_count"]

    def drain() -> None:
        """One availableNow pass of both queries over the files currently
        in in_dir — each pass resumes from its checkpoint (restart
        semantics, state carried forward)."""
        src = spark.readStream.schema(SCHEMA).option("sep", "\t").csv(str(in_dir))
        votes = streaming_near_dup_votes(src, "id", "text", max_hamming=2)
        q1 = (
            votes.writeStream.foreachBatch(curate)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt_dedup))
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(180)
        toks = (
            spark.readStream.schema(SCHEMA)
            .option("sep", "\t")
            .csv(str(in_dir))
            .select(F.explode(tokens(F.col("text"))).alias("tok"))
        )
        q2 = (
            streaming_heavy_hitters(toks, n_shards=4, capacity=64)
            .writeStream.foreachBatch(track)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt_hh))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(180)

    base = "spark joins tables with hash partitions and broadcast plans"
    rows1 = [f"{i}\t{base} variant {i % 7}" for i in range(60)]
    (in_dir / "b1.csv").write_text("\n".join(rows1) + "\n")
    drain()

    rows2 = [f"{i + 60}\t{base} variant {(i + 1) % 7} extra" for i in range(60)]
    rows2 += [f"{200 + i}\tcontact user{i}@example.com about data" for i in range(5)]
    (in_dir / "b2.csv").write_text("\n".join(rows2) + "\n")
    drain()

    curated = spark.read.parquet(str(out_dir))
    top = sorted(
        ((t, c) for shard in summaries.values() for t, c in shard.items()),
        key=lambda tc: -tc[1],
    )[:8]
    print(f"kept per batch             : {kept_counts}")
    print(f"curated rows               : {curated.count()} of 125 seen")
    print(f"redacted PII docs          : {curated.filter(F.col('n_pii_spans') > 0).count()}")
    print(f"streaming heavy hitters    : {[t for t, _ in top]}")
    spark.stop()


if __name__ == "__main__":
    main()
