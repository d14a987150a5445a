"""Round-10 hardening: the two VERDICT-r9 plan fixes (seed_vocab
distributed top-k, skew-proof two-phase domain_cap) pinned as
differentials against the straightforward single-window reference, plus
the four ADVICE-r9 guard closures (ohlc tiebreak nulls — in
test_round9_ops —, streaming_ohlc NTZ enforcement, unigram_encode
generic id types, woe_bins feature nulls) and the public-suffix-set
parameter."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


class TestDomainCapTwoPhase:
    def _reference(self, deduped, cap):
        """The pre-round-10 single-window formulation — correct but a
        mega-domain funnels one task; the two-phase result must be
        bit-identical to it."""
        w = Window.partitionBy("domain").orderBy(
            F.md5(F.col("canonical_url")), F.col("canonical_url")
        )
        return deduped.withColumn(
            "drank", F.row_number().over(w)
        ).withColumn("kept", (F.col("drank") <= cap).cast("int"))

    def _mk(self, spark, n_big=400, n_small=25):
        # one mega-domain holding ~94% of URLs next to a handful of
        # small ones — the web-corpus skew shape the salt must split
        rows = [
            (f"https://big.com/p{i}", "big.com", i + 1, 1)
            for i in range(n_big)
        ] + [
            (f"https://s{j}.org/x", f"s{j}.org", 1000 + j, 2)
            for j in range(n_small)
        ]
        return spark.createDataFrame(
            rows, "canonical_url string, domain string, keep_id long, n_dups long"
        )

    @pytest.mark.parametrize("salt_chars", [1, 2, 3])
    def test_matches_single_window_reference(self, spark, salt_chars):
        from snowplow_s3_loader_spark.operators.urls import domain_cap

        deduped = self._mk(spark)
        got = {
            r["canonical_url"]: (r["drank"], r["kept"])
            for r in domain_cap(deduped, 3, salt_chars=salt_chars).collect()
        }
        ref = {
            r["canonical_url"]: (r["drank"], r["kept"])
            for r in self._reference(deduped, 3).collect()
        }
        assert got == ref

    def test_column_set_and_order_preserved(self, spark):
        from snowplow_s3_loader_spark.operators.urls import domain_cap

        deduped = self._mk(spark, n_big=10, n_small=2)
        out = domain_cap(deduped, 2)
        assert out.columns == [
            "canonical_url", "domain", "keep_id", "n_dups", "drank", "kept"
        ]

    def test_cap_counts_exact_per_domain(self, spark):
        from snowplow_s3_loader_spark.operators.urls import domain_cap

        deduped = self._mk(spark, n_big=50, n_small=5)
        kept = (
            domain_cap(deduped, 7)
            .groupBy("domain")
            .agg(F.sum("kept").alias("k"), F.count("*").alias("n"))
            .collect()
        )
        for r in kept:
            assert r["k"] == min(7, r["n"]), r

    def test_salt_chars_validated(self, spark):
        from snowplow_s3_loader_spark.operators.urls import domain_cap

        deduped = self._mk(spark, n_big=2, n_small=1)
        with pytest.raises(ValueError, match="salt_chars"):
            domain_cap(deduped, 1, salt_chars=0)

    def test_no_single_partition_exchange_in_plan(self, spark):
        import contextlib
        import io

        from snowplow_s3_loader_spark.operators.urls import domain_cap

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            domain_cap(self._mk(spark), 3).explain("formatted")
        plan = buf.getvalue()
        assert "Exchange SinglePartition" not in plan, plan
        for line in plan.splitlines():
            if "windowspecdefinition" in line.lower():
                assert "domain" in line, line


class TestRegisteredDomainSuffixes:
    def test_expanded_suffix_set_changes_grouping(self, spark):
        from snowplow_s3_loader_spark.operators.urls import (
            TWO_LEVEL_SUFFIXES,
            registered_domain,
        )

        hosts = spark.createDataFrame(
            [("alice.github.io",), ("shop.com.mx",), ("news.co.uk",)],
            "h string",
        )
        default = {
            r["h"]: r["d"]
            for r in hosts.select(
                "h", registered_domain(F.col("h")).alias("d")
            ).collect()
        }
        # the pinned default mis-groups PSL entries it doesn't know
        assert default["alice.github.io"] == "github.io"
        assert default["shop.com.mx"] == "com.mx"
        assert default["news.co.uk"] == "news.co.uk"
        expanded = TWO_LEVEL_SUFFIXES + ("github.io", "com.mx")
        got = {
            r["h"]: r["d"]
            for r in hosts.select(
                "h", registered_domain(F.col("h"), expanded).alias("d")
            ).collect()
        }
        assert got["alice.github.io"] == "alice.github.io"
        assert got["shop.com.mx"] == "shop.com.mx"
        assert got["news.co.uk"] == "news.co.uk"

    def test_url_dedup_threads_suffixes(self, spark):
        from snowplow_s3_loader_spark.operators.urls import url_dedup

        df = spark.createDataFrame(
            [(1, "https://a.pages.dev/x"), (2, "https://b.pages.dev/y")],
            "doc_id long, url string",
        )
        doms = {
            r["domain"]
            for r in url_dedup(
                df, "url", "doc_id", suffixes=("pages.dev",)
            ).collect()
        }
        assert doms == {"a.pages.dev", "b.pages.dev"}


class TestUnigramEncodeIdTypes:
    def test_string_doc_ids(self, spark):
        from snowplow_s3_loader_spark.operators.unigram import unigram_encode

        scores = {"a": -10, "b": -10, "ab": -15}
        docs = spark.createDataFrame(
            [("d-one", "ab a"), ("d-two", "b")], "doc_id string, text string"
        )
        got = {
            r["doc_id"]: (r["n_words"], r["n_pieces"])
            for r in unigram_encode(docs, "doc_id", "text", scores, 4).collect()
        }
        assert got == {"d-one": (2, 2), "d-two": (1, 1)}

    def test_dedup_words_variant_identical(self, spark):
        """The distinct-word + join granularity (the measured single-node
        winner on repetitive corpora) must produce the exact same rows as
        the default recompute path."""
        from snowplow_s3_loader_spark.operators.unigram import unigram_encode

        scores = {"a": -10, "b": -12, "c": -14, "ab": -15, "abc": -20}
        docs = spark.createDataFrame(
            [(i, " ".join(["ab", "abc", "c", "ab"][: (i % 4) + 1]))
             for i in range(1, 40)],
            "doc_id long, text string",
        )
        base = unigram_encode(docs, "doc_id", "text", scores, 4)
        alt = unigram_encode(
            docs, "doc_id", "text", scores, 4, dedup_words=True
        )
        assert base.exceptAll(alt).count() == 0
        assert alt.exceptAll(base).count() == 0


class TestStreamingOhlcTypeGuard:
    def test_timestamp_ts_rejected(self, spark):
        from snowplow_s3_loader_spark.streaming.stateful import streaming_ohlc

        ticks = spark.createDataFrame(
            [("k", 1, 1)], "k string, tb long, cents long"
        ).select(
            "k",
            F.lit("2024-01-01 10:00:00").cast("timestamp").alias("ts"),
            "tb",
            "cents",
        ).withColumn("bucket", F.date_trunc("hour", F.col("ts")))
        with pytest.raises(ValueError, match="timestamp_ntz"):
            streaming_ohlc(
                ticks, "k", "bucket", "ts", "tb", "cents", 3_600_000_000
            )

    def test_timestamp_bucket_rejected_in_non_utc_session(self, spark):
        from snowplow_s3_loader_spark.streaming.stateful import streaming_ohlc

        # date_trunc yields TimestampType even on NTZ input — accepted
        # only under a UTC session (bar-end arithmetic stays exact),
        # rejected loudly otherwise (the DST-divergence hazard)
        ticks = spark.createDataFrame(
            [("k", 1, 1)], "k string, tb long, cents long"
        ).select(
            "k",
            F.lit("2024-01-01 10:00:00").cast("timestamp_ntz").alias("ts"),
            "tb",
            "cents",
        ).withColumn("bucket", F.date_trunc("hour", F.col("ts")))
        prev = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            with pytest.raises(ValueError, match="UTC session"):
                streaming_ohlc(
                    ticks, "k", "bucket", "ts", "tb", "cents", 3_600_000_000
                )
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
        # and accepted under UTC (construction only — no stream started)
        streaming_ohlc(
            ticks, "k", "bucket", "ts", "tb", "cents", 3_600_000_000
        )


class TestWoeValueNullGuard:
    def test_null_feature_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import woe_bins

        df = spark.createDataFrame(
            [(1, 1, 0), (None, 2, 1), (3, 3, 0), (4, 4, 1)],
            "v long, tb long, l int",
        )
        with pytest.raises(ValueError, match="NULL"):
            woe_bins(df, "v", "l", 2, ["tb"])
