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

    # the full member-tag census of the former monolith, pinned: a tag
    # silently dropped from the family map (losing its battery row AND
    # its oracle branch together) fails here instead of vanishing
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
        "psi ks spearman mi benford zipf qrank winsor".split()
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
