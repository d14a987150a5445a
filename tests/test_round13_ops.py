"""Round-13 operator tests: contract-hardening guards (isotonic k bound,
ks_statistic distinct-value cardinality) plus the round's new families."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestIsotonicKBound:
    def test_k_over_1000_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            isotonic_calibration,
        )

        df = spark.createDataFrame([(500_000, 1)], "p long, y int")
        with pytest.raises(ValueError, match=r"O\(k\^3\)"):
            isotonic_calibration(df, "p", "y", k=1001)

    def test_k_1000_accepted(self, spark):
        # the cap itself is legal (bound check only — no fit run here;
        # plan construction is where the ValueError would fire)
        from snowplow_s3_loader_spark.operators.profile import (
            isotonic_calibration,
        )

        df = spark.createDataFrame([(500_000, 1)], "p long, y int")
        out = isotonic_calibration(df, "p", "y", k=1000)
        assert "fitted_micro" in out.columns

    def test_default_k_fit_unchanged(self, spark):
        # the q170 shape: default k=10 still fits (hash stability for
        # the driver row is re-verified by the oracle sweep; this pins
        # the python-level invariant)
        from snowplow_s3_loader_spark.operators.profile import (
            isotonic_calibration,
        )

        rows = []
        for b, n, npos in [(2, 10, 8), (3, 10, 2)]:
            p = b * 100_000 + 50_000
            rows += [(p, 1)] * npos + [(p, 0)] * (n - npos)
        df = spark.createDataFrame(rows, "p long, y int")
        by_bin = {
            r["bin"]: r["fitted_micro"]
            for r in isotonic_calibration(df, "p", "y").collect()
        }
        assert by_bin[2] == by_bin[3] == 500_000


class TestKsDistinctGuard:
    def _vals(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "v long")

    def test_high_cardinality_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import ks_statistic

        a = self._vals(spark, list(range(50)))
        b = self._vals(spark, list(range(25, 75)))
        with pytest.raises(ValueError, match="distinct values"):
            ks_statistic(a, b, "v", max_distinct_values=60)

    def test_bound_disabled_with_none(self, spark):
        from snowplow_s3_loader_spark.operators.profile import ks_statistic

        a = self._vals(spark, list(range(50)))
        b = self._vals(spark, list(range(25, 75)))
        out = ks_statistic(a, b, "v", max_distinct_values=None).collect()[0]
        assert out.n_ref == 50 and out.n_cur == 50

    def test_within_bound_result_unchanged(self, spark):
        # the q153 hand case still returns the identical row under the
        # default guard
        from snowplow_s3_loader_spark.operators.profile import ks_statistic

        out = ks_statistic(
            self._vals(spark, [1, 2, 3]), self._vals(spark, [2, 3, 4]), "v"
        ).collect()[0]
        assert (out.n_ref, out.n_cur, out.d_num, out.ks_micro) == (
            3,
            3,
            3,
            333333,
        )


class TestBatteryFamilySplit:
    """Round-13 split of the q74 monolith into five family batteries:
    the family->tags map is the single authority; both the Spark unions
    and the partitioned oracles must agree with it exactly."""

    # the full member-tag census of the battery families, pinned: a tag
    # silently dropped from the family map (losing its battery row AND
    # its oracle branch together) fails here instead of vanishing.
    # Extends the r12 monolith's 96 members with the round-13 folds
    # (first batch: mrr, seasonal, theilsen, kanon, jsd, smd, w1;
    # second: gini, cramer, wq, mk, cksum; third: alloc, vocab) —
    # UPDATE THIS PIN when a new family lands, it is the deliberate
    # record of what the family batteries are expected to carry.
    MONOLITH_TAGS = frozenset(
        "bloom heavy zorder quantile packing cdc incr quantize interval "
        "profile pairs checks scd2 parity scd2rt fuzzy diff cms bitmap "
        "skyline skew joinx kmv trailing wsample fd "
        "pagerank triangle kcore hits bfs lpa topo linkpred walks itemsim "
        "kmeans cov lscatter rrf "
        "funnel cohort attribution transitions anomaly spath ohlc km burst "
        "ivals hier chgpt acf cusum trend "
        "bpe unigram urldedup uencode dsir shards mlewis novelty incdedup "
        "subdup trunc charset budget markup linededup phrase colloc winnow "
        "gopher classifier mode entropy srcoverlap "
        "outliers moments histogram chi2 auc woe calib isotonic cuped abz "
        "psi ks spearman mi benford zipf qrank winsor "
        "mrr seasonal theilsen kanon jsd smd w1 "
        "gini cramer wq mk cksum alloc vocab".split()
    )

    def test_family_map_partitions_the_monolith(self):
        from snowplow_s3_loader_spark.plans.composites import (
            BATTERY_FAMILY_TAGS,
        )

        seen = []
        for tags in BATTERY_FAMILY_TAGS.values():
            seen.extend(tags)
        assert len(seen) == len(set(seen)), "tag assigned to two families"
        assert set(seen) == self.MONOLITH_TAGS

    def test_oracle_branch_tags_match_family_map(self):
        import re

        from snowplow_s3_loader_spark.plans.composites import (
            BATTERY_FAMILY_TAGS,
            COMPOSITE_ORACLES,
            _split_top_level_union,
        )

        for name, tags in BATTERY_FAMILY_TAGS.items():
            sql = COMPOSITE_ORACLES[name]
            got = set()
            for br in _split_top_level_union(sql):
                m = re.search(r"'(\w+)' AS battery", br)
                assert m, f"{name}: branch without battery tag"
                got.add(m.group(1))
            assert got == set(tags), name

    def test_spark_fold_literals_match_family_map(self):
        # static: every F.lit("<tag>").alias("battery") fold literal in a
        # battery function's source must equal the family map exactly —
        # robust to members that are legitimately empty at tiny SFs
        # (q135 link prediction emits zero pairs at sf0.001)
        import inspect
        import re

        from snowplow_s3_loader_spark.plans.composites import (
            BATTERY_FAMILY_TAGS,
            QUERIES_ALL,
        )

        for name, tags in BATTERY_FAMILY_TAGS.items():
            src = inspect.getsource(QUERIES_ALL[name])
            got = set(re.findall(r'F\.lit\("(\w+)"\)\.alias\("battery"\)', src))
            assert got == set(tags), name

    def test_spark_battery_tags_within_family_map(self, spark, sf_dir):
        # runtime: the tags a battery actually emits at sf0.001 must be a
        # subset of its family map (equality can miss members empty at
        # this SF; the full-registry oracle sweep checks values anyway)
        from snowplow_s3_loader_spark.plans.composites import (
            BATTERY_FAMILY_TAGS,
            QUERIES_ALL,
        )

        for name, tags in BATTERY_FAMILY_TAGS.items():
            got = {
                r["battery"]
                for r in QUERIES_ALL[name](spark, sf_dir)
                .select("battery")
                .distinct()
                .collect()
            }
            assert got <= set(tags), name
            assert len(got) >= len(tags) - 1, name

    def test_driver_view_exactly_50(self):
        from snowplow_s3_loader_spark.plans.composites import (
            DRIVER_ORACLES,
            DRIVER_QUERIES,
            LOCAL_ONLY_COMPOSITES,
            QUERIES_ALL,
        )

        assert len(DRIVER_QUERIES) == 50
        assert set(DRIVER_ORACLES) == set(DRIVER_QUERIES)
        # merged-away composites stay importable + locally verified
        for name in LOCAL_ONLY_COMPOSITES:
            assert name in QUERIES_ALL
            assert name not in DRIVER_QUERIES


class TestOnlineChangepoint:
    """Round-13 fourteenth parity family: online CUSUM changepoint
    monitor with a frozen reference level — batch snapshot + streaming
    twin."""

    def _batch(self, spark, rows, ref=100, thr=120):
        from snowplow_s3_loader_spark.operators.timeseries import (
            online_changepoint_snapshot,
        )

        df = spark.createDataFrame(rows, "k string, seq long, x long")
        return {
            r["k"]: (
                r["n_seen"], r["s_final"], r["max_abs_s"],
                r["t_hat"], r["first_alarm_t"],
            )
            for r in online_changepoint_snapshot(
                df, "k", ["seq"], "x", ref_value=ref, threshold=thr
            ).collect()
        }

    def test_hand_case(self, spark):
        # x - 100: +5 x4 then -10 x4 -> s walks 5,10,15,20,10,0,-10,-20
        rows = [("a", i, 105) for i in range(4)] + [
            ("a", i, 90) for i in range(4, 8)
        ]
        got = self._batch(spark, rows, ref=100, thr=15)
        # peak |s| = 20 first reached at t=4; |s| crosses 15 first at t=4
        assert got == {"a": (8, -20, 20, 4, 4)}

    def test_planted_shift_located(self, spark):
        # flat at the reference for 600 samples, then a +25 step: the
        # peak-|s| location must be the LAST sample (drift persists) and
        # the first alarm inside a short detection delay after t=600
        rows = [("m", i, 100) for i in range(600)] + [
            ("m", i, 125) for i in range(600, 900)
        ]
        got = self._batch(spark, rows, ref=100, thr=250)
        n_seen, s_final, max_abs_s, t_hat, alarm_t = got["m"]
        assert (n_seen, s_final) == (900, 300 * 25)
        assert t_hat == 900  # cumulative drift keeps growing
        assert 600 < alarm_t <= 611  # 250/25 = 10 samples of delay
        # and NO alarm on the same series without the shift
        flat = self._batch(
            spark, [("m", i, 100) for i in range(900)], ref=100, thr=250
        )
        assert flat["m"][4] == -1 and flat["m"][2] == 0

    def test_all_zero_deviation_pins_t1(self, spark):
        got = self._batch(
            spark, [("z", i, 100) for i in range(5)], ref=100, thr=10
        )
        assert got == {"z": (5, 0, 0, 1, -1)}

    def test_streaming_matches_batch_across_boundaries(self, spark, tmp_path):
        import os
        import random
        import time as _time

        from snowplow_s3_loader_spark.streaming.stateful import (
            streaming_changepoint,
        )

        rnd = random.Random(13)
        rows = []
        for k in ("a", "b", "c"):
            for i in range(120):
                base = 100
                if k == "a" and i >= 50:
                    base = 130  # shift crossing the 2nd batch boundary
                if k == "b" and i >= 100:
                    base = 70   # late shift in the 3rd batch
                rows.append((k, i + 1, base + rnd.randrange(-6, 7)))
        ordered = sorted(rows, key=lambda r: r[1])
        thirds = [ordered[:120], ordered[120:240], ordered[240:]]
        in_dir = tmp_path / "chgpt_in"
        in_dir.mkdir(parents=True)
        base_t = _time.time() - 100
        for i, chunk in enumerate(thirds):
            p = in_dir / f"b{i}.csv"
            p.write_text("\n".join(f"{k},{s},{v}" for k, s, v in chunk) + "\n")
            os.utime(p, (base_t + i * 10, base_t + i * 10))
        src = spark.readStream.schema("k string, seq long, x long").option(
            "maxFilesPerTrigger", 1
        ).csv(str(in_dir))
        collected: list = []
        q = (
            streaming_changepoint(
                src, "k", "seq", "x", ref_value=100, threshold=200
            )
            .writeStream.foreachBatch(
                lambda df, bid: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "chgpt_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        got = {}
        for r in collected:  # update mode: last emission per key wins
            got[r["k"]] = (
                r["n_seen"], r["s_final"], r["max_abs_s"],
                r["t_hat"], r["first_alarm_t"],
            )
        want = self._batch(spark, rows, ref=100, thr=200)
        assert got == want
        assert want["a"][4] > 0 and want["b"][4] > 0  # both shifts fired
        assert want["c"][4] == -1  # null series stays quiet


class TestJsDivergence:
    def _df(self, spark, vals):
        return spark.createDataFrame([(v, i) for i, v in enumerate(vals)], "v long, i long")

    def test_hand_case(self, spark):
        import math

        from snowplow_s3_loader_spark.operators.profile import (
            js_divergence_bins,
        )

        ref = self._df(spark, [1, 1, 2, 2])
        cur = self._df(spark, [1, 2, 2, 2])
        out = js_divergence_bins(ref, cur, "v", k=2, tie_cols=["i"]).collect()
        assert [(r["bin"], r["n_ref"], r["n_cur"]) for r in out] == [
            (1, 2, 1), (2, 2, 3),
        ]

        def term(p, q):
            m = (p + q) / 2
            return round(
                (0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)) * 1e6
            )

        assert out[0]["js_micro"] == term(0.5, 0.25)
        assert out[1]["js_micro"] == term(0.5, 0.75)
        assert all(
            r["js_total_micro"] == out[0]["js_micro"] + out[1]["js_micro"]
            for r in out
        )

    def test_vanished_bin_is_finite(self, spark):
        # PSI emits NULL on a vanished bin; JS must emit the finite
        # 0.5*p*ln(2) term instead — its whole reason to exist
        import math

        from snowplow_s3_loader_spark.operators.profile import (
            js_divergence_bins,
        )

        ref = self._df(spark, [1, 1, 5, 5])
        cur = self._df(spark, [1, 1, 1, 1])
        out = {
            r["bin"]: r for r in js_divergence_bins(
                ref, cur, "v", k=2, tie_cols=["i"]
            ).collect()
        }
        assert out[2]["n_cur"] == 0
        assert out[2]["js_micro"] == round(0.5 * 0.5 * math.log(2) * 1e6)

    def test_identical_snapshots_zero(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            js_divergence_bins,
        )

        a = self._df(spark, list(range(40)) * 2)
        rows = js_divergence_bins(a, a, "v", k=5, tie_cols=["i"]).collect()
        assert all(r["js_total_micro"] == 0 for r in rows)


class TestSmdBalance:
    def test_hand_case(self, spark):
        import math

        from snowplow_s3_loader_spark.operators.profile import smd_balance

        rows = [("a", x, 10) for x in (1, 2, 3, 4)] + [
            ("b", x, 10) for x in (3, 4, 5, 6)
        ]
        df = spark.createDataFrame(rows, "arm string, x long, flat long")
        out = {
            r["covariate"]: r
            for r in smd_balance(df, "arm", ["x", "flat"], "a", "b").collect()
        }
        x = out["x"]
        assert (x["n_a"], x["n_b"], x["sum_a"], x["sum_b"]) == (4, 4, 10, 18)
        assert x["gap_num"] == 10 * 4 - 18 * 4
        # var_a = var_b = 5/3; smd = -2 / sqrt(5/3)
        want = round(-2 / math.sqrt(5 / 3) * 1e6)
        assert x["smd_micro"] == want
        # a constant covariate has zero pooled variance -> NULL, balanced
        assert out["flat"]["smd_micro"] is None
        assert out["flat"]["gap_num"] == 0

    def test_third_arm_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import smd_balance

        df = spark.createDataFrame(
            [("a", 1), ("c", 2)], "arm string, x long"
        )
        with pytest.raises(Exception, match="must be"):
            smd_balance(df, "arm", ["x"], "a", "b").collect()

    def test_fractional_covariate_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import smd_balance

        df = spark.createDataFrame(
            [("a", 1.5), ("b", 2.0)], "arm string, x double"
        )
        with pytest.raises(Exception, match="integer"):
            smd_balance(df, "arm", ["x"], "a", "b").collect()


class TestKAnonymity:
    def test_hand_case(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            k_anonymity_audit,
        )

        rows = (
            [("90210", 1980)] * 5
            + [("90210", 1990)] * 2
            + [("10001", 1980)] * 1
            + [(None, 1990)] * 3
        )
        df = spark.createDataFrame(rows, "zip string, yob int")
        out = {
            r["class_size"]: r
            for r in k_anonymity_audit(df, ["zip", "yob"], k=3).collect()
        }
        assert (out[1]["n_classes"], out[1]["violating"]) == (1, True)
        assert (out[2]["n_classes"], out[2]["violating"]) == (1, True)
        assert (out[3]["n_classes"], out[3]["violating"]) == (1, False)
        assert (out[5]["n_classes"], out[5]["violating"]) == (1, False)
        assert all(r["min_class_size"] == 1 for r in out.values())
        assert all(r["n_violating_rows"] == 3 for r in out.values())

    def test_k1_never_violates(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            k_anonymity_audit,
        )

        df = spark.createDataFrame([(i,) for i in range(4)], "q int")
        rows = k_anonymity_audit(df, ["q"], k=1).collect()
        assert all(not r["violating"] for r in rows)
        assert rows[0]["n_violating_rows"] == 0


class TestSeasonalProfile:
    def test_hand_case(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            seasonal_profile,
        )

        # 2026-08-10 is a Monday
        rows = [
            ("s", "2026-08-10", 200), ("s", "2026-08-10", 400),  # Mon
            ("s", "2026-08-11", 100),                            # Tue
            ("s", "2026-08-17", 300),                            # Mon
        ]
        df = spark.createDataFrame(rows, "g string, d string, v long").select(
            "g", F.col("d").cast("timestamp").alias("ts"), "v"
        )
        out = {r["dow"]: r for r in seasonal_profile(df, "g", "ts", "v").collect()}
        mon = out[1]
        assert (mon["n"], mon["sum_v"], mon["n_all"], mon["sum_all"]) == (
            3, 900, 4, 1000,
        )
        # (900 * 4 * 1e6) div (3 * 1000) = 1_200_000
        assert mon["index_micro"] == 1_200_000
        assert out[2]["index_micro"] == (100 * 4 * 1_000_000) // (1 * 1000)

    def test_epoch_anchor_is_thursday(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            seasonal_profile,
        )

        df = spark.createDataFrame(
            [("g", "1970-01-01", 1)], "g string, d string, v long"
        ).select("g", F.col("d").cast("timestamp").alias("ts"), "v")
        [r] = seasonal_profile(df, "g", "ts", "v").collect()
        assert r["dow"] == 4  # ISO Thursday


class TestTheilSen:
    def test_robust_to_outlier(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            theil_sen_slopes,
        )

        pts = [("s", x, 2 * x) for x in range(1, 10)] + [("s", 10, 1000)]
        df = spark.createDataFrame(pts, "g string, x long, y long")
        [r] = theil_sen_slopes(df, "g", "x", "y").collect()
        assert r["n_points"] == 10 and r["n_pairs"] == 45
        assert r["median_slope_micro"] == 2_000_000  # outlier ignored

    def test_equal_x_pairs_excluded(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            theil_sen_slopes,
        )

        df = spark.createDataFrame(
            [("s", 1, 5), ("s", 1, 9), ("s", 2, 7)], "g string, x long, y long"
        )
        [r] = theil_sen_slopes(df, "g", "x", "y").collect()
        assert r["n_pairs"] == 2  # the (1,1) pair is out

    def test_single_point_null_median(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            theil_sen_slopes,
        )

        df = spark.createDataFrame([("s", 1, 5)], "g string, x long, y long")
        [r] = theil_sen_slopes(df, "g", "x", "y").collect()
        assert r["n_pairs"] == 0 and r["median_slope_micro"] is None

    def test_group_size_cap_raises(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            theil_sen_slopes,
        )

        df = spark.createDataFrame(
            [("s", i, i) for i in range(30)], "g string, x long, y long"
        )
        with pytest.raises(Exception, match="max_group_points"):
            theil_sen_slopes(df, "g", "x", "y", max_group_points=10).collect()

    def test_negative_slope_sign_split(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            theil_sen_slopes,
        )

        # y = -3x exactly: every pairwise slope is -3e6 on both the
        # sign-split and a true rational evaluation
        df = spark.createDataFrame(
            [("s", x, -3 * x) for x in range(5)], "g string, x long, y long"
        )
        [r] = theil_sen_slopes(df, "g", "x", "y").collect()
        assert r["median_slope_micro"] == -3_000_000


class TestRetrievalMetrics:
    def test_hand_case(self, spark):
        import math

        from snowplow_s3_loader_spark.operators.retrieval import (
            retrieval_metrics,
        )

        rows = [(1, r, rel) for r, rel in zip(range(1, 6), [0, 1, 0, 1, 0])]
        df = spark.createDataFrame(rows, "q long, rank long, rel int")
        [out] = retrieval_metrics(df, "q", "rank", "rel", k=5).collect()
        g = lambda r: round(1e6 / math.log2(r + 1))
        assert (out["n_ranked"], out["n_rel"], out["first_rel_rank"]) == (
            5, 2, 2,
        )
        assert out["rr_micro"] == 500_000
        assert out["dcg_micro"] == g(2) + g(4)
        assert out["idcg_micro"] == g(1) + g(2)
        assert out["ndcg_micro"] == (g(2) + g(4)) * 1_000_000 // (g(1) + g(2))

    def test_no_relevant_zeroes(self, spark):
        from snowplow_s3_loader_spark.operators.retrieval import (
            retrieval_metrics,
        )

        df = spark.createDataFrame(
            [(1, 1, 0), (1, 2, 0)], "q long, rank long, rel int"
        )
        [out] = retrieval_metrics(df, "q", "rank", "rel", k=5).collect()
        assert (out["rr_micro"], out["dcg_micro"], out["ndcg_micro"]) == (
            0, 0, 0,
        )
        assert out["first_rel_rank"] is None

    def test_perfect_ranking_ndcg_one(self, spark):
        from snowplow_s3_loader_spark.operators.retrieval import (
            retrieval_metrics,
        )

        df = spark.createDataFrame(
            [(1, 1, 1), (1, 2, 1), (1, 3, 0)], "q long, rank long, rel int"
        )
        [out] = retrieval_metrics(df, "q", "rank", "rel", k=5).collect()
        assert out["ndcg_micro"] == 1_000_000 and out["rr_micro"] == 1_000_000

    def test_duplicate_rank_raises(self, spark):
        from snowplow_s3_loader_spark.operators.retrieval import (
            retrieval_metrics,
        )

        df = spark.createDataFrame(
            [(1, 1, 0), (1, 1, 1)], "q long, rank long, rel int"
        )
        with pytest.raises(Exception, match="duplicated rank"):
            retrieval_metrics(df, "q", "rank", "rel", k=5).collect()


class TestWasserstein:
    def _vals(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "v long")

    def test_hand_case_unit_shift(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            wasserstein_distance,
        )

        [out] = wasserstein_distance(
            self._vals(spark, [1, 2, 3]), self._vals(spark, [2, 3, 4]), "v"
        ).collect()
        assert (out["n_ref"], out["n_cur"], out["n_values"]) == (3, 3, 4)
        assert out["w1_micro"] == 1_000_000  # everything moved by 1

    def test_identical_zero(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            wasserstein_distance,
        )

        a = self._vals(spark, [5, 9, 9, 40])
        [out] = wasserstein_distance(a, a, "v").collect()
        assert out["w1_micro"] == 0

    def test_magnitude_reads_where_ks_saturates(self, spark):
        # disjoint supports: KS is 1.0 for ANY shift; W1 reads the size
        from snowplow_s3_loader_spark.operators.profile import (
            wasserstein_distance,
        )

        a = self._vals(spark, [0, 0])
        [near] = wasserstein_distance(
            a, self._vals(spark, [10, 10]), "v"
        ).collect()
        [far] = wasserstein_distance(
            a, self._vals(spark, [1000, 1000]), "v"
        ).collect()
        assert near["w1_micro"] == 10_000_000
        assert far["w1_micro"] == 1_000_000_000

    def test_distinct_guard_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            wasserstein_distance,
        )

        a = self._vals(spark, list(range(40)))
        with pytest.raises(ValueError, match="distinct"):
            wasserstein_distance(a, a, "v", max_distinct_values=10)


class TestGiniConcentration:
    def _run(self, spark, rows):
        from snowplow_s3_loader_spark.operators.profile import (
            gini_concentration,
        )

        df = spark.createDataFrame(
            rows, "group string, entity string, v long"
        )
        return {
            r["group"]: r
            for r in gini_concentration(
                df, "group", "entity", "v"
            ).collect()
        }

    def test_differential_vs_pairwise_definition(self, spark):
        # Gini == sum|xi-xj| / (2 n^2 mean) — brute force on the
        # per-entity totals, floored to micro like the operator
        import itertools

        vals = [3, 1, 4, 1, 5, 9, 2, 6]
        rows = [("g", f"e{i}", v) for i, v in enumerate(vals)]
        got = self._run(spark, rows)["g"]
        n, s = len(vals), sum(vals)
        num = sum(
            abs(a - b) for a, b in itertools.product(vals, vals)
        )
        assert got["gini_micro"] == num * 1_000_000 // (2 * n * s)
        assert got["hhi_micro"] == (
            sum(v * v for v in vals) * 1_000_000 // (s * s)
        )

    def test_entity_pre_aggregation(self, spark):
        # two rows for one entity must merge before ranking
        rows = [("g", "a", 5), ("g", "a", 5), ("g", "b", 10)]
        got = self._run(spark, rows)["g"]
        assert got["n_entities"] == 2
        assert got["gini_micro"] == 0  # both entities hold 10

    def test_zero_total_null_ratios(self, spark):
        got = self._run(spark, [("g", "a", 0), ("g", "b", 0)])["g"]
        assert got["gini_micro"] is None and got["hhi_micro"] is None

    def test_negative_value_raises(self, spark):
        from pyspark.errors import PySparkRuntimeError
        from py4j.protocol import Py4JJavaError

        with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)):
            self._run(spark, [("g", "a", -1)])


class TestMannKendall:
    def _run(self, spark, rows, **kw):
        from snowplow_s3_loader_spark.operators.timeseries import (
            mann_kendall_trend,
        )

        df = spark.createDataFrame(rows, "group string, x long, y long")
        return {
            r["group"]: r
            for r in mann_kendall_trend(df, "group", "x", "y", **kw).collect()
        }

    def test_differential_vs_bruteforce(self, spark):
        import itertools
        import math

        ys = [5, 3, 8, 8, 2, 9, 1, 7]
        rows = [("g", i, y) for i, y in enumerate(ys)]
        got = self._run(spark, rows)["g"]
        n = len(ys)
        s = sum(
            (yj > yi) - (yj < yi)
            for (i, yi), (j, yj) in itertools.combinations(
                enumerate(ys), 2
            )
        )
        from collections import Counter

        tt = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tt
        assert got["s_stat"] == s
        assert got["var18"] == var18
        zc = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
        want = round(zc / math.sqrt(var18 / 18.0) * 1_000_000)
        assert got["z_micro"] == want

    def test_all_tied_null_z(self, spark):
        got = self._run(spark, [("g", i, 7) for i in range(5)])["g"]
        assert got["s_stat"] == 0 and got["var18"] == 0
        assert got["z_micro"] is None

    def test_duplicate_x_raises(self, spark):
        with pytest.raises(Exception, match="duplicate x"):
            self._run(spark, [("g", 1, 1), ("g", 1, 2)])

    def test_group_cap_raises(self, spark):
        rows = [("g", i, i) for i in range(11)]
        with pytest.raises(Exception, match="max_group_points"):
            self._run(spark, rows, max_group_points=10)

    def test_single_point(self, spark):
        got = self._run(spark, [("g", 1, 1)])["g"]
        assert got["n_pairs"] == 0 and got["z_micro"] is None


class TestCramersV:
    def _run(self, spark, rows):
        from snowplow_s3_loader_spark.operators.profile import cramers_v

        df = spark.createDataFrame(rows, "a string, b string")
        return cramers_v(df, "a", "b").collect()[0]

    def test_perfect_association_is_one(self, spark):
        rows = [("x", "p")] * 7 + [("y", "q")] * 13
        got = self._run(spark, rows)
        assert got["v_micro"] == 1_000_000
        # chi2 == n for a perfect 2x2 (micro, minus bounded truncation)
        assert abs(got["chi2_micro"] - 20_000_000) <= 4

    def test_independence_is_zero(self, spark):
        rows = []
        for a in ("x", "y"):
            for b in ("p", "q"):
                rows += [(a, b)] * 5
        got = self._run(spark, rows)
        assert got["chi2_micro"] == 0 and got["v_micro"] == 0

    def test_differential_vs_python(self, spark):
        # exact staged-truncation replica in pure python
        from collections import Counter

        pairs = [
            ("x", "p"), ("x", "p"), ("x", "q"), ("y", "p"),
            ("y", "q"), ("y", "q"), ("z", "p"), ("z", "q"),
            ("z", "q"), ("z", "q"),
        ]
        got = self._run(spark, pairs)
        n = len(pairs)
        obs = Counter(pairs)
        ra = Counter(a for a, _ in pairs)
        cb = Counter(b for _, b in pairs)
        chi2 = 0
        for a in ra:
            for b in cb:
                dev = n * obs.get((a, b), 0) - ra[a] * cb[b]
                chi2 += dev * dev // (ra[a] * cb[b]) * 1_000_000 // n
        assert got["chi2_micro"] == chi2
        assert got["dof"] == 2

    def test_single_level_null_v(self, spark):
        got = self._run(spark, [("x", "p"), ("x", "q")])
        assert got["v_micro"] is None


class TestTableChecksum:
    def _run(self, spark, rows, cols, group=None):
        from snowplow_s3_loader_spark.operators.profile import table_checksum

        df = spark.createDataFrame(rows, "k long, s string")
        return table_checksum(df, cols, group_col=group).collect()

    def test_order_invariant(self, spark):
        a = self._run(spark, [(1, "a"), (2, "b"), (3, "c")], ["k", "s"])
        b = self._run(spark, [(3, "c"), (1, "a"), (2, "b")], ["k", "s"])
        assert a == b

    def test_duplicate_rows_detected(self, spark):
        # xor alone is blind to x XOR x; count + modular sum catch it
        a = self._run(spark, [(1, "a"), (2, "b")], ["k", "s"])[0]
        b = self._run(
            spark, [(1, "a"), (1, "a"), (1, "a"), (2, "b")], ["k", "s"]
        )[0]
        assert a["xor60"] != b["xor60"] or a["n_rows"] != b["n_rows"]
        assert (a["n_rows"], a["sum_mod"]) != (b["n_rows"], b["sum_mod"])

    def test_null_not_confused_with_literal(self, spark):
        a = self._run(spark, [(1, None)], ["k", "s"])[0]
        b = self._run(spark, [(1, "\x00N")], ["k", "s"])[0]
        # sentinel equals the one reserved string — collision is the
        # documented contract boundary; anything else must differ
        c = self._run(spark, [(1, "NULL")], ["k", "s"])[0]
        assert a["xor60"] != c["xor60"]
        assert a["xor60"] == b["xor60"]  # reserved-string boundary, documented

    def test_any_field_change_moves_digest(self, spark):
        base = self._run(spark, [(1, "a"), (2, "b")], ["k", "s"])[0]
        for rows in ([(1, "a"), (2, "c")], [(1, "a"), (9, "b")]):
            got = self._run(spark, rows, ["k", "s"])[0]
            assert got["xor60"] != base["xor60"]


class TestWeightedQuantiles:
    def _run(self, spark, rows, **kw):
        from snowplow_s3_loader_spark.operators.profile import (
            weighted_quantiles,
        )

        df = spark.createDataFrame(rows, "group string, v long, w long")
        return weighted_quantiles(df, "group", "v", "w", **kw).collect()

    def test_differential_vs_python(self, spark):
        import random

        rng = random.Random(13)
        rows = [
            ("g", rng.randrange(100), rng.randrange(1, 9))
            for _ in range(200)
        ]
        qs = [100_000, 500_000, 999_999]
        got = {
            r["q_micro"]: r["value"]
            for r in self._run(spark, rows, q_micros=qs)
        }
        from collections import defaultdict

        agg = defaultdict(int)
        for _, v, w in rows:
            agg[v] += w
        W = sum(agg.values())
        for q in qs:
            cum = 0
            for v in sorted(agg):
                cum += agg[v]
                if cum * 1_000_000 >= q * W:
                    assert got[q] == v
                    break

    def test_weight_ties_merge_before_prefix(self, spark):
        # equal values from different rows must pre-sum (q08 lesson)
        rows = [("g", 5, 1), ("g", 5, 1), ("g", 9, 1)]
        got = self._run(spark, rows, q_micros=[500_000])
        assert got[0]["value"] == 5 and got[0]["w_total"] == 3

    def test_nonpositive_weight_raises(self, spark):
        with pytest.raises(Exception, match="positive"):
            self._run(spark, [("g", 1, 0)])


class TestLargestRemainderAllocation:
    def _run(self, spark, rows, n):
        from snowplow_s3_loader_spark.operators.sampling import (
            largest_remainder_allocation,
        )

        df = spark.createDataFrame(rows, "stratum string, w long")
        return largest_remainder_allocation(df, "stratum", "w", n).collect()

    def test_hamilton_textbook_case(self, spark):
        rows = self._run(
            spark, [("a", 453), ("b", 342), ("c", 205)], 10
        )
        got = {r["stratum"]: r["alloc"] for r in rows}
        assert got == {"a": 5, "b": 3, "c": 2}

    def test_sums_exactly_to_budget(self, spark):
        import random

        rng = random.Random(29)
        rows = [(f"s{i}", rng.randrange(1, 10_000)) for i in range(40)]
        for n in (7, 1_000, 999_983):
            out = self._run(spark, rows, n)
            assert sum(r["alloc"] for r in out) == n

    def test_differential_vs_python(self, spark):
        import random

        rng = random.Random(31)
        rows = [(f"s{i}", rng.randrange(0, 500)) for i in range(25)]
        n = 123
        got = {r["stratum"]: r["alloc"] for r in self._run(spark, rows, n)}
        W = sum(w for _, w in rows)
        base = {s: w * n // W for s, w in rows}
        rem = {s: w * n % W for s, w in rows}
        L = n - sum(base.values())
        order = sorted(rows, key=lambda sw: (-rem[sw[0]], sw[0]))
        want = dict(base)
        for s, _ in order[:L]:
            want[s] += 1
        assert got == want

    def test_zero_budget_raises(self, spark):
        with pytest.raises(ValueError, match="positive"):
            self._run(spark, [("a", 1)], 0)

    def test_negative_weight_raises(self, spark):
        with pytest.raises(Exception, match="non-negative"):
            self._run(spark, [("a", -3)], 5)


class TestVocabRichness:
    def _run(self, spark, texts):
        from snowplow_s3_loader_spark.operators.text import vocab_richness

        df = spark.createDataFrame([(t,) for t in texts], "text string")
        return vocab_richness(df, "text").collect()[0]

    def test_hand_case(self, spark):
        got = self._run(spark, ["a a b c"])
        assert (got["n_tokens"], got["distinct_tokens"]) == (4, 3)
        assert (got["f1"], got["f2"]) == (2, 1)
        # chao1 = 3 + 2*1/(2*2) = 3.5; unseen = 2/4
        assert got["chao1_micro"] == 3_500_000
        assert got["unseen_micro"] == 500_000

    def test_no_singletons_chao_equals_distinct(self, spark):
        got = self._run(spark, ["a a b b c c"])
        assert got["f1"] == 0
        assert got["chao1_micro"] == got["distinct_tokens"] * 1_000_000
        assert got["unseen_micro"] == 0

    def test_f2_zero_bias_corrected_defined(self, spark):
        got = self._run(spark, ["a b c"])  # all singletons, f2 = 0
        # 3 + 3*2/(2*1) = 6
        assert got["chao1_micro"] == 6_000_000

    def test_differential_vs_python(self, spark):
        import random

        rng = random.Random(41)
        words = [f"w{rng.randrange(60)}" for _ in range(400)]
        texts = [
            " ".join(words[i : i + 20]) for i in range(0, 400, 20)
        ]
        got = self._run(spark, texts)
        from collections import Counter

        c = Counter(words)
        D, N = len(c), sum(c.values())
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        assert (got["n_tokens"], got["distinct_tokens"]) == (N, D)
        assert (got["f1"], got["f2"]) == (f1, f2)
        assert got["chao1_micro"] == D * 1_000_000 + f1 * (
            f1 - 1
        ) * 1_000_000 // (2 * (f2 + 1))


class TestStreamingChecksum:
    def test_streaming_matches_batch_any_interleaving(self, spark, tmp_path):
        """Drain three deliberately un-ordered micro-batches through
        streaming_table_checksum; the final digests must equal batch
        table_checksum on the union bit-for-bit (every component is a
        commutative fold)."""
        import pyspark.sql.functions as F
        from snowplow_s3_loader_spark.operators.profile import table_checksum
        from snowplow_s3_loader_spark.streaming.stateful import (
            streaming_table_checksum,
        )

        rows = [
            (f"g{i % 3}", i * 7 % 50, f"s{i * 13 % 11}") for i in range(90)
        ]
        df = spark.createDataFrame(rows, "grp string, k long, s string")
        in_dir = str(tmp_path / "in")
        # residue slices — NOT arrival-ordered
        for i in range(3):
            df.where(F.col("k") % 3 == i).write.mode("append").parquet(in_dir)
        src = (
            spark.readStream.schema("grp string, k long, s string")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        digests = {}

        def _fb(b, bid):
            for r in b.collect():
                digests[r["group"]] = (
                    r["n_rows"], r["xor60"], r["sum_mod"],
                    r["min_h"], r["max_h"],
                )

        q = (
            streaming_table_checksum(src, ["k", "s"], "grp")
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(_fb)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not drain"
        batch = {
            r["group"]: (
                r["n_rows"], r["xor60"], r["sum_mod"],
                r["min_h"], r["max_h"],
            )
            for r in table_checksum(df, ["k", "s"], group_col="grp").collect()
        }
        assert digests == batch
