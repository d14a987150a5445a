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
        # the round-11 default is the vendored PSL snapshot: entries the
        # legacy tuple mis-grouped now promote correctly
        default = {
            r["h"]: r["d"]
            for r in hosts.select(
                "h", registered_domain(F.col("h")).alias("d")
            ).collect()
        }
        assert default["alice.github.io"] == "alice.github.io"
        assert default["shop.com.mx"] == "shop.com.mx"
        assert default["news.co.uk"] == "news.co.uk"
        # the legacy tuple stays available (and pinned: the q143 oracle
        # row passes it explicitly) — it still mis-groups what it
        # doesn't know, by construction
        legacy = {
            r["h"]: r["d"]
            for r in hosts.select(
                "h",
                registered_domain(F.col("h"), TWO_LEVEL_SUFFIXES).alias("d"),
            ).collect()
        }
        assert legacy["alice.github.io"] == "github.io"
        assert legacy["shop.com.mx"] == "com.mx"
        assert legacy["news.co.uk"] == "news.co.uk"

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


def _md5_60bit(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestDsir:
    """Differentials vs an independent pure-python DSIR (dict/loop based,
    shares no code with the operator)."""

    DOCS = [
        (1, "the cat sat on the mat", 1),
        (2, "the dog ran far away from home", 0),
        (3, "cat cat cat cat", 0),
        (4, "completely unrelated vocabulary here", 0),
        (5, "the cat and the dog sat", 1),
        (6, "", 0),
    ]
    B = 64

    def _ref_weights(self):
        import math

        feats = {}  # doc -> list of buckets
        for doc_id, text, _t in self.DOCS:
            toks = [t for t in text.strip().split() if t != ""] if text.strip() else []
            grams = list(toks) + [
                f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
            ]
            if grams:
                feats[doc_id] = [_md5_60bit(g) % self.B for g in grams]
        tc: dict = {}
        rc: dict = {}
        nt = nr = 0
        for doc_id, _text, t in self.DOCS:
            for b in feats.get(doc_id, []):
                rc[b] = rc.get(b, 0) + 1
                nr += 1
                if t:
                    tc[b] = tc.get(b, 0) + 1
                    nt += 1
        diff = {
            b: round(math.log((tc.get(b, 0) + 1) / (nt + self.B)) * 1e6)
            - round(math.log((rc.get(b, 0) + 1) / (nr + self.B)) * 1e6)
            for b in range(self.B)
        }
        return {
            d: (len(bs), sum(diff[b] for b in bs)) for d, bs in feats.items()
        }

    def test_weights_match_reference(self, spark):
        from snowplow_s3_loader_spark.operators.dsir import dsir_weights

        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, text string, t int"
        )
        got = {
            r["doc_id"]: (r["n_feats"], r["weight_micro"])
            for r in dsir_weights(
                docs, "doc_id", "text", F.col("t") == 1, n_buckets=self.B
            ).collect()
        }
        assert got == self._ref_weights()

    def test_blank_doc_absent(self, spark):
        from snowplow_s3_loader_spark.operators.dsir import dsir_weights

        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, text string, t int"
        )
        ids = {
            r["doc_id"]
            for r in dsir_weights(
                docs, "doc_id", "text", F.col("t") == 1, n_buckets=self.B
            ).collect()
        }
        assert 6 not in ids and ids == {1, 2, 3, 4, 5}

    def test_targets_score_above_offtopic(self, spark):
        """Sanity direction: the target docs (and near-target doc 3,
        sharing 'cat') must outscore the fully off-topic doc 4."""
        from snowplow_s3_loader_spark.operators.dsir import dsir_weights

        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, text string, t int"
        )
        w = {
            r["doc_id"]: r["weight_micro"]
            for r in dsir_weights(
                docs, "doc_id", "text", F.col("t") == 1, n_buckets=self.B
            ).collect()
        }
        assert w[1] > w[4] and w[5] > w[4]

    def test_select_topk_deterministic(self, spark):
        from snowplow_s3_loader_spark.operators.dsir import (
            dsir_select,
            dsir_weights,
        )

        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, text string, t int"
        )
        w = dsir_weights(docs, "doc_id", "text", F.col("t") == 1, self.B)
        ref = sorted(
            self._ref_weights().items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:2]
        got = {r["doc_id"] for r in dsir_select(w, 2).collect()}
        assert got == {d for d, _ in ref}

    def test_bucket_guard(self, spark):
        from snowplow_s3_loader_spark.operators.dsir import hashed_features

        docs = spark.createDataFrame([(1, "a", 0)], "doc_id long, text string, t int")
        with pytest.raises(ValueError, match="n_buckets"):
            hashed_features(docs, "doc_id", "text", 1)


class TestTokenShards:
    def _ref(self, rows, n_shards):
        import hashlib

        order = sorted(
            rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
        )
        total = sum(w for _, w in rows)
        out, start = {}, 0
        for rn, (doc_id, w) in enumerate(order, 1):
            out[doc_id] = (rn, start, start * n_shards // total)
            start += w
        return out

    def test_matches_reference_permutation(self, spark):
        from snowplow_s3_loader_spark.operators.layout import token_shards

        rows = [(i, (i * 37) % 90 + 1) for i in range(1, 200)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = {
            r["doc_id"]: (r["rn"], r["start"], r["shard"])
            for r in token_shards(df, "doc_id", "w", 8).collect()
        }
        assert got == self._ref(rows, 8)

    def test_shards_contiguous_and_balanced(self, spark):
        from snowplow_s3_loader_spark.operators.layout import token_shards

        rows = [(i, (i * 13) % 50 + 1) for i in range(1, 500)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        sh = token_shards(df, "doc_id", "w", 10)
        stats = (
            sh.groupBy("shard")
            .agg(
                F.min("rn").alias("lo"),
                F.max("rn").alias("hi"),
                F.count("*").alias("n"),
                F.sum("w").alias("tok"),
            )
            .orderBy("shard")
            .collect()
        )
        total = sum(w for _, w in rows)
        per = total / 10
        max_doc = max(w for _, w in rows)
        prev_hi = 0
        for r in stats:
            # contiguous rn tiling: each shard's range abuts the previous
            assert r["lo"] == prev_hi + 1 and r["hi"] - r["lo"] + 1 == r["n"]
            prev_hi = r["hi"]
            # token balance within one document of the ideal cut
            assert abs(r["tok"] - per) <= per + max_doc
        assert prev_hi == len(rows)

    def test_zero_weight_rejected(self, spark):
        from snowplow_s3_loader_spark.operators.layout import token_shards

        df = spark.createDataFrame([(1, 5), (2, 0)], "doc_id long, w long")
        with pytest.raises(Exception, match="must be integers >= 1"):
            token_shards(df, "doc_id", "w", 2).collect()

    def test_empty_input(self, spark):
        from snowplow_s3_loader_spark.operators.layout import token_shards

        df = spark.createDataFrame([], "doc_id long, w long")
        assert token_shards(df, "doc_id", "w", 4).count() == 0


class TestGlobalRunningTotal:
    def test_matches_single_window(self, spark):
        from pyspark.sql import Window

        from snowplow_s3_loader_spark.operators.ranking import (
            global_running_total,
        )

        rows = [(i, (i * 7) % 23 + 1) for i in range(1, 300)]
        df = spark.createDataFrame(rows, "k long, v long")
        got, n, total = global_running_total(df, [F.col("k")], "v")
        assert n == 299 and total == sum(v for _, v in rows)
        w = Window.orderBy("k")
        ref = df.withColumn(
            "rn_ref", F.row_number().over(w)
        ).withColumn(
            "start_ref",
            F.coalesce(
                F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        joined = got.join(ref.select("k", "rn_ref", "start_ref"), "k")
        bad = joined.where(
            (F.col("rn") != F.col("rn_ref"))
            | (F.col("start") != F.col("start_ref"))
        ).count()
        assert bad == 0

    def test_null_value_rejected(self, spark):
        from snowplow_s3_loader_spark.operators.ranking import (
            global_running_total,
        )

        df = spark.createDataFrame([(1, 5), (2, None)], "k long, v long")
        # the guard rides the projection; the eager localCheckpoint
        # inside the two-phase pass evaluates it at construction
        with pytest.raises(Exception, match="must be non-null"):
            got, _, _ = global_running_total(df, [F.col("k")], "v")
            got.collect()


class TestMooreLewis:
    DOCS = [
        (1, "the cat sat on the mat", 1),
        (2, "the dog ran home", 0),
        (3, "cat sat cat sat", 0),
        (4, "zz yy xx ww", 0),
        (5, "one", 0),
    ]

    def _ref(self, k=0.5):
        import math

        toks = {d: t.split() for d, t, _ in self.DOCS if t}
        vocab = {w for ts in toks.values() for w in ts}
        bgs = {
            d: [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
            for d, ts in toks.items()
        }
        c2r: dict = {}
        c1r: dict = {}
        c2t: dict = {}
        c1t: dict = {}
        tflag = {d: t for d, _, t in self.DOCS}
        for d, pairs in bgs.items():
            for g in pairs:
                c2r[g] = c2r.get(g, 0) + 1
                c1r[g[0]] = c1r.get(g[0], 0) + 1
                if tflag[d]:
                    c2t[g] = c2t.get(g, 0) + 1
                    c1t[g[0]] = c1t.get(g[0], 0) + 1
        v = len(vocab)
        out = {}
        for d, _, _t in self.DOCS:
            pairs = bgs.get(d, [])
            if not pairs:
                out[d] = (0, None, None, None)
                continue
            st = sum(
                round(
                    math.log(
                        (c2t.get(g, 0) + k) / (c1t.get(g[0], 0) + k * v)
                    )
                    * 1e6
                )
                for g in pairs
            )
            sr = sum(
                round(math.log((c2r[g] + k) / (c1r[g[0]] + k * v)) * 1e6)
                for g in pairs
            )
            out[d] = (len(pairs), st, sr, st - sr)
        return out

    def test_matches_reference(self, spark):
        from snowplow_s3_loader_spark.operators.lm import moore_lewis_scores

        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, text string, t int"
        )
        got = {
            r["id"]: (
                r["n_bigrams"],
                r["sum_logp_target"],
                r["sum_logp_raw"],
                r["ml_micronats"],
            )
            for r in moore_lewis_scores(
                docs, "doc_id", "text", F.col("t") == 1
            ).collect()
        }
        assert got == self._ref()

    def test_target_docs_score_highest(self, spark):
        """Direction sanity: the target doc and its vocabulary twin must
        outscore the disjoint-vocabulary doc."""
        from snowplow_s3_loader_spark.operators.lm import moore_lewis_scores

        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, text string, t int"
        )
        ml = {
            r["id"]: r["ml_micronats"]
            for r in moore_lewis_scores(
                docs, "doc_id", "text", F.col("t") == 1
            ).collect()
        }
        assert ml[1] > ml[4] and ml[3] > ml[4]


class TestCanonicalizationEquivalence:
    """The staged pipeline form (canonicalized — linear plan) and the
    single-Column form (canonicalize_url) implement ONE contract; any
    divergence is silent corruption of the dedup key. Hypothesis
    generates both well-formed and garbage inputs; each example runs a
    single Spark job over the whole generated batch."""

    @staticmethod
    def _urls():
        from hypothesis import strategies as st

        host_label = st.text(
            alphabet="abcDEFgh09-", min_size=1, max_size=6
        )
        host = st.lists(host_label, min_size=1, max_size=4).map(".".join)
        scheme = st.sampled_from(["http", "HTTPS", "ftp", "s3+x"])
        port = st.sampled_from(["", ":80", ":443", ":8080"])
        path = st.text(
            alphabet="abcXY/0._~", min_size=0, max_size=12
        )
        params = st.lists(
            st.sampled_from(
                ["a=1", "b=2", "utm_source=x", "fbclid=9", "Z=", ""]
            ),
            max_size=4,
        ).map("&".join)
        frag = st.sampled_from(["", "#f", "#a/b?c"])
        userinfo = st.sampled_from(["", "u@", "u:p@"])
        wellformed = st.builds(
            lambda s, ui, h, po, pa, q, fr: f"{s}://{ui}{h}{po}/{pa}"
            + (f"?{q}" if q else "")
            + fr,
            scheme, userinfo, host, port, path, params, frag,
        )
        garbage = st.text(max_size=30)
        return st.lists(
            st.one_of(wellformed, garbage), min_size=1, max_size=40
        )

    def test_forms_agree(self, spark):
        from hypothesis import HealthCheck, given, settings

        from snowplow_s3_loader_spark.operators.urls import (
            canonicalize_url,
            canonicalized,
        )

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(self._urls())
        def run(urls):
            df = spark.createDataFrame(
                [(i, u) for i, u in enumerate(urls)], "i long, url string"
            )
            col_form = {
                r["i"]: r["c"]
                for r in df.select(
                    "i", canonicalize_url(F.col("url")).alias("c")
                ).collect()
            }
            staged = {
                r["i"]: r["canonical_url"]
                for r in canonicalized(df, "url").collect()
            }
            assert col_form == staged

        run()


class TestDomainCapProperty:
    def test_two_phase_equals_single_window_random(self, spark):
        """Property: for random (domain skew, url multiplicity) frames
        and every salt width, the two-phase rank is bit-identical to
        the single-window reference."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
        from pyspark.sql import Window

        from snowplow_s3_loader_spark.operators.urls import domain_cap

        frames = st.lists(
            st.tuples(
                st.integers(0, 4),      # domain id (skewed small space)
                st.integers(0, 1000),   # path id
            ),
            min_size=1,
            max_size=60,
            unique=True,
        )

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(frames, st.integers(1, 3), st.integers(1, 4))
        def run(pairs, cap, salt_chars):
            rows = [
                (f"https://d{d}.com/p{p}", f"d{d}.com", 1, d * 10_000 + p)
                for d, p in pairs
            ]
            deduped = spark.createDataFrame(
                rows,
                "canonical_url string, domain string, n_dups long, keep_id long",
            )
            got = {
                r["canonical_url"]: (r["drank"], r["kept"])
                for r in domain_cap(deduped, cap, salt_chars).collect()
            }
            w = Window.partitionBy("domain").orderBy(
                F.md5(F.col("canonical_url")), F.col("canonical_url")
            )
            ref = {
                r["canonical_url"]: (r["drank"], r["kept"])
                for r in deduped.withColumn(
                    "drank", F.row_number().over(w)
                )
                .withColumn("kept", (F.col("drank") <= cap).cast("int"))
                .collect()
            }
            assert got == ref

        run()


class TestNgramNovelty:
    DOCS = [
        (1, "a b c d"),      # owns both its trigrams (abc, bcd)
        (2, "a b c d e"),    # abc/bcd owned by doc 1; cde is novel
        (3, "a b c a b c"),  # repeated grams + mixed ownership
        (4, "x y"),          # too short: no trigrams, NULL novelty
        (5, "a b c d"),      # exact repeat of doc 1: fully stale
    ]

    def _ref(self, n=3):
        grams = {
            d: [
                tuple(t.split()[i : i + n])
                for i in range(len(t.split()) - n + 1)
            ]
            for d, t in self.DOCS
        }
        owner: dict = {}
        for d in sorted(grams):
            for g in grams[d]:
                owner.setdefault(g, d)
        out = {}
        for d, gs in grams.items():
            distinct = set(gs)
            novel = sum(1 for g in distinct if owner[g] == d)
            out[d] = (
                len(gs),
                len(distinct),
                novel,
                (novel * 1_000_000) // len(distinct) if distinct else None,
            )
        return out

    def test_matches_reference(self, spark):
        from snowplow_s3_loader_spark.operators.text import ngram_novelty

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            r["id"]: (
                r["n_grams"], r["n_distinct"], r["n_novel"],
                r["novelty_micro"],
            )
            for r in ngram_novelty(docs, "doc_id", "text", 3).collect()
        }
        assert got == self._ref()
        # the planted structure: doc 1 fully novel, doc 5 fully stale,
        # doc 4 evidence-free
        assert got[1][3] == 1_000_000
        assert got[5] == (2, 2, 0, 0)
        assert got[4] == (0, 0, 0, None)


class TestIncrementalMinhashFilter:
    def _mk(self, spark):
        hist = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
                (3, "red green blue yellow purple orange"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
                (11, "totally fresh never seen words here"),  # novel
                (12, "one two three four five six seven"),    # exact dup of 2
                (13, "red green blue cyan magenta white"),    # partial overlap
            ],
            "doc_id long, text string",
        )
        return hist, new

    def test_exact_dups_hit_all_bands_novel_hits_none(self, spark):
        from snowplow_s3_loader_spark.operators.dedup import (
            incremental_minhash_filter,
            minhash_bands,
        )

        hist, new = self._mk(spark)
        store = minhash_bands(hist, "doc_id", "text").select(
            "band_id", "band_hash"
        )
        got = {
            r["id"]: (r["n_hit_bands"], r["is_dup"])
            for r in incremental_minhash_filter(
                new, store, "doc_id", "text"
            ).collect()
        }
        assert got[10] == (4, 1)  # 16 hashes / band_size 4 = all 4 bands
        assert got[12] == (4, 1)
        assert got[11] == (0, 0)
        assert got[13][0] <= 3  # partial overlap never matches all bands

    def test_store_multiplicity_irrelevant(self, spark):
        """Semi-join membership: duplicating the store rows must not
        change any count (the caller never needs to dedupe the store)."""
        from snowplow_s3_loader_spark.operators.dedup import (
            incremental_minhash_filter,
            minhash_bands,
        )

        hist, new = self._mk(spark)
        store = minhash_bands(hist, "doc_id", "text").select(
            "band_id", "band_hash"
        )
        doubled = store.unionByName(store)
        a = {
            r["id"]: r["n_hit_bands"]
            for r in incremental_minhash_filter(
                new, store, "doc_id", "text"
            ).collect()
        }
        b = {
            r["id"]: r["n_hit_bands"]
            for r in incremental_minhash_filter(
                new, doubled, "doc_id", "text"
            ).collect()
        }
        assert a == b

    def test_incremental_store_update_roundtrip(self, spark):
        """The documented maintenance loop: union the survivors' bands
        into the store; a re-arrival of a survivor then flags as dup."""
        from snowplow_s3_loader_spark.operators.dedup import (
            incremental_minhash_filter,
            minhash_bands,
        )

        hist, new = self._mk(spark)
        store = minhash_bands(hist, "doc_id", "text").select(
            "band_id", "band_hash"
        )
        first = incremental_minhash_filter(new, store, "doc_id", "text")
        survivors = new.join(
            first.where(F.col("is_dup") == 0).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        )
        store2 = store.unionByName(
            minhash_bands(survivors, "doc_id", "text").select(
                "band_id", "band_hash"
            )
        )
        again = {
            r["id"]: r["is_dup"]
            for r in incremental_minhash_filter(
                survivors.select(
                    (F.col("doc_id") + 100).alias("doc_id"), "text"
                ),
                store2,
                "doc_id",
                "text",
            ).collect()
        }
        assert all(v == 1 for v in again.values())


class TestPsiBins:
    def _ref(self, ref_rows, cur_rows, k):
        import math

        order = sorted(ref_rows)
        total = len(order)
        qn, r = divmod(total, k)
        edges = []
        pos = 0
        for b in range(1, k):
            pos += qn + (1 if b <= r else 0)
            edges.append(order[pos - 1][0])

        def bin_of(v):
            return 1 + sum(1 for e in edges if e < v)

        nr: dict = {}
        nc: dict = {}
        for v, _t in ref_rows:
            nr[bin_of(v)] = nr.get(bin_of(v), 0) + 1
        for v, _t in cur_rows:
            nc[bin_of(v)] = nc.get(bin_of(v), 0) + 1
        out = {}
        NR, NC = len(ref_rows), len(cur_rows)
        for b in range(1, k + 1):
            p = nr.get(b, 0) / NR
            q = nc.get(b, 0) / NC
            psi = (
                round((p - q) * math.log(p / q) * 1e6)
                if nr.get(b, 0) and nc.get(b, 0)
                else None
            )
            out[b] = (
                edges[b - 1] if b < k else None,
                nr.get(b, 0),
                nc.get(b, 0),
                psi,
            )
        return out

    def test_matches_reference(self, spark):
        from snowplow_s3_loader_spark.operators.profile import psi_bins

        ref_rows = [((i * 37) % 200, i) for i in range(1, 400)]
        cur_rows = [((i * 53) % 260, i) for i in range(1, 300)]
        ref = spark.createDataFrame(ref_rows, "v long, tb long")
        cur = spark.createDataFrame(cur_rows, "v long, tb long")
        got = {
            r["bin"]: (r["upper_edge"], r["n_ref"], r["n_cur"], r["psi_micro"])
            for r in psi_bins(ref, cur, "v", k=7, tie_cols=["tb"]).collect()
        }
        assert got == self._ref(ref_rows, cur_rows, 7)

    def test_identical_snapshots_zero_psi(self, spark):
        from snowplow_s3_loader_spark.operators.profile import psi_bins

        rows = [((i * 13) % 90, i) for i in range(1, 200)]
        df = spark.createDataFrame(rows, "v long, tb long")
        out = psi_bins(df, df, "v", k=5, tie_cols=["tb"]).collect()
        assert all(r["psi_micro"] == 0 for r in out)

    def test_guards(self, spark):
        from snowplow_s3_loader_spark.operators.profile import psi_bins

        ok = spark.createDataFrame([(1, 1)], "v long, tb long")
        empty = spark.createDataFrame([], "v long, tb long")
        with pytest.raises(ValueError, match="reference snapshot is empty"):
            psi_bins(empty, ok, "v", 2, ["tb"])
        with pytest.raises(ValueError, match="k must be"):
            psi_bins(ok, ok, "v", 0, ["tb"])
        nulls = spark.createDataFrame([(None, 1), (2, 2)], "v long, tb long")
        with pytest.raises(Exception, match="has NULLs"):
            psi_bins(nulls, ok, "v", 2, ["tb"])

    def test_vanished_bin_emits_null(self, spark):
        from snowplow_s3_loader_spark.operators.profile import psi_bins

        ref = spark.createDataFrame(
            [(i, i) for i in range(1, 101)], "v long, tb long"
        )
        cur = spark.createDataFrame(
            [(i, i) for i in range(1, 21)], "v long, tb long"
        )  # only the first fifth survives
        out = {r["bin"]: r for r in psi_bins(ref, cur, "v", 5, ["tb"]).collect()}
        assert out[1]["psi_micro"] is not None
        assert all(out[b]["psi_micro"] is None for b in (2, 3, 4, 5))
        assert all(out[b]["n_cur"] == 0 for b in (2, 3, 4, 5))


class TestWoeValueNullGuard:
    def test_null_feature_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import woe_bins

        df = spark.createDataFrame(
            [(1, 1, 0), (None, 2, 1), (3, 3, 0), (4, 4, 1)],
            "v long, tb long, l int",
        )
        with pytest.raises(ValueError, match="NULL"):
            woe_bins(df, "v", "l", 2, ["tb"])
