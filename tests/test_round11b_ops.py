"""Round-11 second-wave operators: calibration bins, two-proportion
z-test, FD profiling, char-level entropy — each differential-tested
against an independent pure-python reference plus its guard contracts."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from pyspark.sql.utils import PythonException


def _collect_err(df):
    with pytest.raises(Exception) as ei:
        df.collect()
    return str(ei.value)


class TestCalibrationBins:
    def _frame(self, spark, rows):
        return spark.createDataFrame(rows, "p long, y int")

    def test_matches_pure_python_reference(self, spark):
        """Exact (n, n_pos, avg, frac, gap, ece) vs an independent
        integer reference on a deterministic mixed-score set."""
        from snowplow_s3_loader_spark.operators.profile import (
            calibration_bins,
        )

        rows = [
            ((i * 7919) % 1000001, 1 if (i * 104729) % 1000001 < (i * 7919) % 1000001 else 0)
            for i in range(500)
        ]
        k = 10
        # pure-python reference
        bins = {b: [0, 0, 0] for b in range(k)}
        for p, y in rows:
            b = min(p * k // 1_000_000, k - 1)
            bins[b][0] += 1
            bins[b][1] += y
            bins[b][2] += p
        expect = {}
        ece = 0
        for b in range(k):
            n, np_, ss = bins[b]
            if n > 0:
                avg = ss // n
                frac = np_ * 1_000_000 // n
                gap = abs(avg - frac)
                ece += n * gap
                expect[b] = (n, np_, avg, frac, gap)
            else:
                expect[b] = (0, 0, None, None, None)
        got = calibration_bins(self._frame(spark, rows), "p", "y", k=k).collect()
        assert len(got) == k
        for r in got:
            assert (
                r["n"],
                r["n_pos"],
                r["avg_score_micro"],
                r["frac_pos_micro"],
                r["gap_micro"],
            ) == expect[r["bin"]], r
            assert r["ece_num"] == ece

    def test_perfectly_calibrated_scores_have_zero_gap(self, spark):
        """A bin whose scores all equal its positive rate gaps at 0
        (200 rows at p = 0.25e6, exactly 50 positive)."""
        from snowplow_s3_loader_spark.operators.profile import (
            calibration_bins,
        )

        rows = [(250_000, 1 if i < 50 else 0) for i in range(200)]
        out = {
            r["bin"]: r
        for r in calibration_bins(self._frame(spark, rows), "p", "y", k=4).collect()}
        assert out[1]["n"] == 200 and out[1]["gap_micro"] == 0
        assert out[1]["ece_num"] == 0

    def test_score_eq_one_lands_in_last_bin(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            calibration_bins,
        )

        rows = [(1_000_000, 1)]
        out = calibration_bins(self._frame(spark, rows), "p", "y", k=10).collect()
        assert [r["n"] for r in out] == [0] * 9 + [1]

    def test_out_of_range_score_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            calibration_bins,
        )

        msg = _collect_err(
            calibration_bins(
                self._frame(spark, [(1_000_001, 0)]), "p", "y", k=10
            )
        )
        assert "micro-unit probability" in msg

    def test_bad_label_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            calibration_bins,
        )

        msg = _collect_err(
            calibration_bins(self._frame(spark, [(5, 2)]), "p", "y", k=10)
        )
        assert "must be 0/1" in msg

    def test_bad_k_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            calibration_bins,
        )

        with pytest.raises(ValueError, match="k must be"):
            calibration_bins(self._frame(spark, [(5, 0)]), "p", "y", k=0)


class TestTwoProportionZ:
    def _frame(self, spark, rows, schema="v string, s int"):
        return spark.createDataFrame(rows, schema)

    def test_matches_pure_python_z(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            two_proportion_z,
        )

        rows = (
            [("a", 1)] * 60
            + [("a", 0)] * 40
            + [("b", 1)] * 45
            + [("b", 0)] * 55
        )
        got = two_proportion_z(
            self._frame(spark, rows), "v", "s", "a", "b"
        ).collect()[0]
        n_a, n_b, x_a, x_b = 100, 100, 60, 45
        p = (x_a + x_b) / (n_a + n_b)
        se = math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
        z = round((x_a / n_a - x_b / n_b) / se * 1_000_000)
        assert (got["n_a"], got["n_b"], got["x_a"], got["x_b"]) == (
            n_a,
            n_b,
            x_a,
            x_b,
        )
        assert got["diff_num"] == x_a * n_b - x_b * n_a == 1500
        assert got["z_micro"] == z

    def test_identical_rates_give_zero(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            two_proportion_z,
        )

        rows = [("a", 1)] * 3 + [("a", 0)] * 7 + [("b", 1)] * 3 + [("b", 0)] * 7
        got = two_proportion_z(
            self._frame(spark, rows), "v", "s", "a", "b"
        ).collect()[0]
        assert got["diff_num"] == 0 and got["z_micro"] == 0

    def test_degenerate_pool_rate_gives_null_z(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            two_proportion_z,
        )

        rows = [("a", 1)] * 5 + [("b", 1)] * 5
        got = two_proportion_z(
            self._frame(spark, rows), "v", "s", "a", "b"
        ).collect()[0]
        assert got["z_micro"] is None and got["diff_num"] == 0

    def test_third_arm_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            two_proportion_z,
        )

        msg = _collect_err(
            two_proportion_z(
                self._frame(spark, [("a", 1), ("c", 0)]), "v", "s", "a", "b"
            )
        )
        assert "must be" in msg

    def test_null_success_raises(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            two_proportion_z,
        )

        msg = _collect_err(
            two_proportion_z(
                self._frame(spark, [("a", None), ("b", 1)]), "v", "s", "a", "b"
            )
        )
        assert "0/1" in msg

    def test_strata_split_counts(self, spark):
        from snowplow_s3_loader_spark.operators.profile import (
            two_proportion_z,
        )

        rows = [
            ("g1", "a", 1),
            ("g1", "b", 0),
            ("g2", "a", 0),
            ("g2", "b", 1),
            ("g2", "b", 0),
        ]
        got = {
            r["g"]: r
            for r in two_proportion_z(
                self._frame(spark, rows, "g string, v string, s int"),
                "v",
                "s",
                "a",
                "b",
                strata_cols=["g"],
            ).collect()
        }
        assert (got["g1"]["n_a"], got["g1"]["n_b"], got["g1"]["x_a"], got["g1"]["x_b"]) == (1, 1, 1, 0)
        assert (got["g2"]["n_a"], got["g2"]["n_b"], got["g2"]["x_a"], got["g2"]["x_b"]) == (1, 2, 0, 1)


class TestFdCheck:
    def test_holds_and_violations(self, spark):
        from snowplow_s3_loader_spark.operators.profile import fd_check

        df = spark.createDataFrame(
            [(1, 10, "x"), (2, 10, "x"), (3, 20, "y"), (4, 20, "z")],
            "id long, det long, dep string",
        )
        out = {
            r["fd"]: r
            for r in fd_check(
                df, [(["id"], "dep"), (["det"], "dep")]
            ).collect()
        }
        assert out["id->dep"]["holds"] == 1
        assert out["id->dep"]["n_groups"] == 4
        assert out["det->dep"]["holds"] == 0
        assert out["det->dep"]["n_violating"] == 1
        assert out["det->dep"]["max_dep_values"] == 2

    def test_null_dep_counts_as_distinct_value(self, spark):
        """{1, NULL} under one determinant must read 2 dependent values
        (plain count(distinct) would silently report 1 and call the FD
        held)."""
        from snowplow_s3_loader_spark.operators.profile import fd_check

        df = spark.createDataFrame(
            [(10, 1), (10, None), (20, 2)], "det long, dep long"
        )
        row = fd_check(df, [(["det"], "dep")]).collect()[0]
        assert row["n_violating"] == 1 and row["max_dep_values"] == 2

    def test_null_determinant_is_a_group(self, spark):
        from snowplow_s3_loader_spark.operators.profile import fd_check

        df = spark.createDataFrame(
            [(None, 1), (None, 2), (1, 3)], "det long, dep long"
        )
        row = fd_check(df, [(["det"], "dep")]).collect()[0]
        assert row["n_groups"] == 2 and row["n_violating"] == 1

    def test_multi_column_determinant(self, spark):
        from snowplow_s3_loader_spark.operators.profile import fd_check

        df = spark.createDataFrame(
            [(1, 1, "a"), (1, 2, "b"), (1, 1, "a")],
            "d1 long, d2 long, dep string",
        )
        row = fd_check(df, [(["d1", "d2"], "dep")]).collect()[0]
        assert row["fd"] == "d1,d2->dep"
        assert row["n_groups"] == 2 and row["holds"] == 1

    def test_multi_pair_matches_single_pair_calls(self, spark):
        """The multi-pair GROUPING SETS path (round 13: one level-1
        scan shared by all pairs) must emit bit-identical rows to
        per-pair single calls (which keep the plain two-level
        aggregation), including shared-column-set pairs (a->b plus
        b->a ride ONE grouping set) and NULLs in both roles."""
        from snowplow_s3_loader_spark.operators.profile import fd_check

        df = spark.createDataFrame(
            [
                (1, 10, "x"),
                (2, 10, "x"),
                (3, 20, "y"),
                (4, 20, None),
                (None, 20, "y"),
                (None, None, "z"),
            ],
            "a long, b long, c string",
        )
        deps = [
            (["a"], "b"),
            (["b"], "a"),  # same column set as the pair above
            (["a", "b"], "c"),
            (["b"], "c"),
        ]
        multi = sorted(
            tuple(r) for r in fd_check(df, deps).collect()
        )
        singles = sorted(
            tuple(r)
            for d in deps
            for r in fd_check(df, [d]).collect()
        )
        assert multi == singles

    def test_bad_pairs_raise(self, spark):
        from snowplow_s3_loader_spark.operators.profile import fd_check

        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError, match="at least one"):
            fd_check(df, [])
        with pytest.raises(ValueError, match="bad pair"):
            fd_check(df, [(["a"], "a")])
        with pytest.raises(ValueError, match="bad pair"):
            fd_check(df, [([], "a")])


class TestCharEntropy:
    def _run(self, spark, texts):
        from snowplow_s3_loader_spark.operators.text import char_entropy

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r["id"]: r
            for r in char_entropy(df, "doc_id", "text").collect()
        }

    @staticmethod
    def _ref(text):
        """Independent reference with the operator's own quantization
        contract (round once per distinct count, integer-sum, truncate)."""
        from collections import Counter

        c = Counter(text)
        n = len(text)
        if n == 0:
            return (0, 0, None)
        s = sum(
            cnt * int(_round_half_up(math.log(cnt) * 1_000_000))
            for cnt in c.values()
        )
        return (
            n,
            len(c),
            int(_round_half_up(math.log(n) * 1_000_000)) - s // n,
        )

    def test_matches_reference_on_mixed_texts(self, spark):
        texts = [
            "aaaa",
            "abab",
            "abcdefgh",
            "the quick brown fox jumps over the lazy dog",
            "aA bB!!??",
            "",
            "x",
        ]
        got = self._run(spark, texts)
        for i, t in enumerate(texts):
            n, nd, em = self._ref(t)
            assert (
                got[i]["n_chars"],
                got[i]["n_distinct_chars"],
                got[i]["entropy_micro"],
            ) == (n, nd, em), (i, t)

    def test_single_char_flood_is_zero_entropy(self, spark):
        got = self._run(spark, ["zzzzzzzzzzzz"])
        assert got[0]["entropy_micro"] == 0

    def test_uniform_distribution_hits_ln_k(self, spark):
        """16 distinct chars once each: H = ln(16) exactly (quantized)."""
        got = self._run(spark, ["abcdefghijklmnop"])
        # ln(16)*1e6 = 2772588.72...; per-term ln(1)=0 so H = round(ln 16 * 1e6)
        assert got[0]["entropy_micro"] == 2772589

    def test_high_entropy_beats_natural_text(self, spark):
        got = self._run(
            spark,
            [
                "the the the the the the the the",
                "q7Zp3kX9vR2mW8sL5nJ4hT6gB1cD0fY",
            ],
        )
        assert got[1]["entropy_micro"] > got[0]["entropy_micro"]


def _round_half_up(x: float) -> float:
    """Spark F.round / DuckDB round semantics: half away from zero."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


class TestQualityBudgetSelect:
    def _frame(self, spark, rows):
        return spark.createDataFrame(rows, "id long, s long, t long")

    def test_matches_pure_python_greedy(self, spark):
        from snowplow_s3_loader_spark.operators.sampling import (
            quality_budget_select,
        )

        rows = [(i, (i * 7919) % 1000, 10 + (i * 31) % 90) for i in range(300)]
        budget = 5000
        order = sorted(rows, key=lambda r: (-r[1], r[0]))
        cum, expect = 0, {}
        for i, s, t in order:
            expect[i] = (s, t, cum, cum < budget)
            cum += t
        got = quality_budget_select(
            self._frame(spark, rows), "id", "s", "t", budget
        ).collect()
        assert len(got) == 300
        for r in got:
            assert (
                r["s"],
                r["n_tokens"],
                r["cum_before"],
                r["kept"],
            ) == expect[r["id"]], r
        # the kept set covers the budget and is minimal: kept mass >=
        # budget (boundary doc included) and dropping the boundary doc
        # goes under
        kept = sorted(
            (r for r in got if r["kept"]), key=lambda r: r["cum_before"]
        )
        mass = sum(r["n_tokens"] for r in kept)
        assert mass >= budget
        assert mass - kept[-1]["n_tokens"] < budget

    def test_budget_covers_everything_keeps_all(self, spark):
        from snowplow_s3_loader_spark.operators.sampling import (
            quality_budget_select,
        )

        rows = [(1, 5, 10), (2, 3, 10)]
        got = quality_budget_select(
            self._frame(spark, rows), "id", "s", "t", 10_000
        ).collect()
        assert all(r["kept"] for r in got)

    def test_score_ties_break_by_id(self, spark):
        from snowplow_s3_loader_spark.operators.sampling import (
            quality_budget_select,
        )

        rows = [(2, 7, 6), (1, 7, 6), (3, 7, 6)]
        got = {
            r["id"]: r
            for r in quality_budget_select(
                self._frame(spark, rows), "id", "s", "t", 7
            ).collect()
        }
        assert got[1]["kept"] and got[2]["kept"] and not got[3]["kept"]
        assert got[2]["cum_before"] == 6 and got[3]["cum_before"] == 12

    def test_guards(self, spark):
        from snowplow_s3_loader_spark.operators.sampling import (
            quality_budget_select,
        )

        with pytest.raises(ValueError, match="budget_tokens"):
            quality_budget_select(
                self._frame(spark, [(1, 1, 1)]), "id", "s", "t", 0
            )
        # the per-row guards fire during the ranking's boundary-sampling
        # job, i.e. already at operator CONSTRUCTION — wrap the whole call
        with pytest.raises(Exception, match="NULL"):
            quality_budget_select(
                self._frame(spark, [(1, None, 1)]), "id", "s", "t", 5
            ).collect()
        with pytest.raises(Exception, match="non-negative"):
            quality_budget_select(
                self._frame(spark, [(1, 1, -3)]), "id", "s", "t", 5
            ).collect()


class TestSurvivalCurve:
    def _run(self, spark, rows):
        from snowplow_s3_loader_spark.operators.profile import survival_curve

        df = spark.createDataFrame(rows, "g string, d long, e int")
        return survival_curve(df, "g", "d", "e").collect()

    @staticmethod
    def _ref(rows):
        """Independent pure-python KM with the operator's quantization
        contract."""
        out = {}
        by_t = {}
        for _, d, e in rows:
            by_t.setdefault(d, [0, 0])
            by_t[d][0] += e
            by_t[d][1] += 1 - e
        total = len(rows)
        seen = 0
        cum = 0
        dead = False
        for t in sorted(by_t):
            d_t, c_t = by_t[t]
            n_t = total - seen
            seen += d_t + c_t
            if d_t == 0:
                step = 0
            elif d_t < n_t:
                step = int(_round_half_up(math.log(1 - d_t / n_t) * 1_000_000))
            else:
                step = None
            if step is None:
                dead = True
            if not dead:
                cum += step
            out[t] = (n_t, d_t, c_t, step, None if dead else cum)
        return out

    def test_matches_textbook_km(self, spark):
        """The classic KM example shape: events and censors interleaved,
        ties at one time, a censor-only time (step 0)."""
        rows = (
            [("a", 1, 1), ("a", 1, 1), ("a", 2, 0), ("a", 3, 1),
             ("a", 5, 0), ("a", 5, 0), ("a", 8, 1), ("a", 9, 1),
             ("a", 9, 0), ("a", 12, 0)]
        )
        got = {r["t"]: r for r in self._run(spark, rows)}
        want = self._ref(rows)
        assert set(got) == set(want)
        for t, (n, d, c, step, cum) in want.items():
            r = got[t]
            assert (
                r["n_at_risk"], r["n_events"], r["n_censored"],
                r["step_ln_micro"], r["cum_ln_micro"],
            ) == (n, d, c, step, cum), (t, r)

    def test_curve_dies_when_all_remaining_exit_as_events(self, spark):
        """d = n at the last time: S(t) = 0 exactly — NULL step and the
        cumulative curve NULL from there on."""
        rows = [("a", 1, 1), ("a", 2, 1), ("a", 2, 1)]
        got = {r["t"]: r for r in self._run(spark, rows)}
        assert got[1]["step_ln_micro"] is not None
        assert got[2]["step_ln_micro"] is None
        assert got[2]["cum_ln_micro"] is None

    def test_censoring_shrinks_risk_set_without_a_step(self, spark):
        rows = [("a", 1, 0), ("a", 1, 0), ("a", 2, 1), ("a", 3, 0)]
        got = {r["t"]: r for r in self._run(spark, rows)}
        assert got[1]["step_ln_micro"] == 0 and got[1]["n_at_risk"] == 4
        assert got[2]["n_at_risk"] == 2
        # ln(1 - 1/2) = -ln 2
        assert got[2]["step_ln_micro"] == -693147

    def test_groups_are_independent(self, spark):
        rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 1)]
        got = {(r["group"], r["t"]): r for r in self._run(spark, rows)}
        assert got[("b", 1)]["n_at_risk"] == 1
        assert got[("a", 1)]["n_at_risk"] == 2

    def test_guards(self, spark):
        from snowplow_s3_loader_spark.operators.profile import survival_curve

        df = spark.createDataFrame([("a", -1, 1)], "g string, d long, e int")
        with pytest.raises(Exception, match="non-negative"):
            survival_curve(df, "g", "d", "e").collect()
        df2 = spark.createDataFrame([("a", 1, 7)], "g string, d long, e int")
        with pytest.raises(Exception, match="censored"):
            survival_curve(df2, "g", "d", "e").collect()


class TestKleinbergBursts:
    def _events(self, spark, gaps, key="k"):
        import datetime

        t = datetime.datetime(2024, 1, 1)
        rows = [(key, t, 0)]
        for i, g in enumerate(gaps):
            t = t + datetime.timedelta(seconds=g)
            rows.append((key, t, i + 1))
        return spark.createDataFrame(
            rows, "key string, ts timestamp_ntz, eid long"
        )

    @staticmethod
    def _ref(gaps, s_num=2, gamma_micro=1_000_000):
        """Independent pure-python Viterbi with the operator's pinned
        integer contract."""
        n_gaps = len(gaps)
        n = n_gaps + 1
        mean = sum(gaps) // n_gaps
        lnsm = int(math.floor(math.log(s_num) * 1e6 + 0.5))
        lnnm = int(math.floor(math.log(n) * 1e6 + 0.5))
        trans = (gamma_micro * lnnm) // 1_000_000
        deltas = [
            (s_num - 1) * ((x * 1_000_000) // mean) - lnsm for x in gaps
        ]
        BIG = 1 << 62
        dp0, dp1, hist = 0, BIG, []
        for d in deltas:
            a, b = min(dp0, dp1), min(dp1, dp0 + trans) + d
            hist.append((a, b))
            dp0, dp1 = a, b
        states = [0] * n_gaps
        cur = 0 if dp0 <= dp1 else 1
        states[-1] = cur
        for i in range(n_gaps - 1, 0, -1):
            p0, p1 = hist[i - 1]
            cur = (0 if p0 <= p1 else 1) if cur == 0 else (
                1 if p1 <= p0 + trans else 0
            )
            states[i - 1] = cur
        runs = sum(
            1
            for i, st in enumerate(states)
            if st == 1 and (i == 0 or states[i - 1] == 0)
        )
        mx = run = 0
        for st in states:
            run = run + 1 if st == 1 else 0
            mx = max(mx, run)
        return (
            n, n_gaps, mean, sum(states), runs, mx, min(dp0, dp1)
        )

    def test_planted_burst_recovered_exactly(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            kleinberg_bursts,
        )

        gaps = [100 + (i % 3) for i in range(80)]
        gaps[30:50] = [5 + (i % 2) for i in range(20)]
        [r] = kleinberg_bursts(
            self._events(spark, gaps), "key", "ts", "eid"
        ).collect()
        want = self._ref(gaps)
        assert (
            r["n_events"], r["n_gaps"], r["mean_gap_s"],
            r["n_burst_gaps"], r["n_bursts"], r["max_burst_gaps"],
            r["cost_micro"],
        ) == want
        # the planted 20-gap burst is the one detected run
        assert r["n_bursts"] == 1 and r["n_burst_gaps"] == 20

    def test_two_bursts_and_quiet_corpus(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            kleinberg_bursts,
        )

        gaps = [60] * 100
        gaps[10:18] = [2] * 8
        gaps[70:82] = [3] * 12
        [r] = kleinberg_bursts(
            self._events(spark, gaps), "key", "ts", "eid"
        ).collect()
        assert r["n_bursts"] == 2 and r["max_burst_gaps"] == 12
        assert (
            r["n_events"], r["n_gaps"], r["mean_gap_s"],
            r["n_burst_gaps"], r["n_bursts"], r["max_burst_gaps"],
            r["cost_micro"],
        ) == self._ref(gaps)
        # uniform gaps: no burst worth gamma*ln(n)
        gaps2 = [60] * 50
        [r2] = kleinberg_bursts(
            self._events(spark, gaps2), "key", "ts", "eid"
        ).collect()
        assert r2["n_bursts"] == 0 and r2["n_burst_gaps"] == 0

    def test_unordered_arrival_is_window_sorted(self, spark):
        """The DP must see gaps in time order even when the frame's
        physical row order is scrambled (applyInPandas group order is
        arbitrary)."""
        from snowplow_s3_loader_spark.operators.timeseries import (
            kleinberg_bursts,
        )

        gaps = [100] * 40
        gaps[5:15] = [4] * 10
        df = self._events(spark, gaps).orderBy(F.xxhash64("eid"))
        [r] = kleinberg_bursts(df, "key", "ts", "eid").collect()
        assert (
            r["n_events"], r["n_gaps"], r["mean_gap_s"],
            r["n_burst_gaps"], r["n_bursts"], r["max_burst_gaps"],
            r["cost_micro"],
        ) == self._ref(gaps)

    def test_short_key_emits_trivial_row(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            kleinberg_bursts,
        )

        [r] = kleinberg_bursts(
            self._events(spark, [10]), "key", "ts", "eid"
        ).collect()
        assert r["n_gaps"] == 1 and r["n_bursts"] == 0
        assert r["cost_micro"] is None and r["mean_gap_s"] is None

    def test_guards(self, spark):
        from snowplow_s3_loader_spark.operators.timeseries import (
            kleinberg_bursts,
        )

        with pytest.raises(ValueError, match="s_num"):
            kleinberg_bursts(
                self._events(spark, [1, 2]), "key", "ts", "eid", s_num=1
            )
        # sub-second corpus: mean gap 0 raises inside the DP
        with pytest.raises(Exception, match="mean gap 0"):
            kleinberg_bursts(
                self._events(spark, [0, 0, 0]), "key", "ts", "eid"
            ).collect()


class TestTruncationRecall:
    def test_identity_truncation_is_perfect_recall(self, spark):
        """dims_keep = full dimensionality: the two rankings coincide,
        recall = 1e6 exactly for every query."""
        from snowplow_s3_loader_spark.operators.similarity import (
            truncation_recall,
        )

        rows = [
            (i, [float((i * 7 + j * 13) % 10) for j in range(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = truncation_recall(
            df, F.col("vec_id") % 10 == 0, k=3, dims_keep=8
        ).collect()
        assert out and all(r["recall_micro"] == 1_000_000 for r in out)

    def test_adversarial_tail_dims_break_recall(self, spark):
        """Vectors identical in the first 2 dims but decisive in the
        tail: truncating to 2 dims must NOT recover the full ranking."""
        from snowplow_s3_loader_spark.operators.similarity import (
            truncation_recall,
        )

        import random

        rnd = random.Random(3)
        rows = [
            (i, [1.0, 2.0] + [rnd.uniform(-5, 5) for _ in range(6)])
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = truncation_recall(
            df, F.col("vec_id") % 20 == 0, k=5, dims_keep=2
        ).collect()
        assert any(r["recall_micro"] < 1_000_000 for r in out)

    def test_matches_pure_python_overlap(self, spark):
        from snowplow_s3_loader_spark.operators.similarity import (
            truncation_recall,
        )

        import math as m

        rows = [
            (i, [float(((i + 1) * (j + 3)) % 7) - 3.0 for j in range(6)])
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        k, dk = 4, 3

        def topk(vecs, qid, dims):
            qv = vecs[qid][:dims]
            scored = []
            for nid, v in vecs.items():
                if nid == qid:
                    continue
                vv = v[:dims]
                num = sum(a * b for a, b in zip(qv, vv))
                den = m.sqrt(sum(a * a for a in qv)) * m.sqrt(
                    sum(a * a for a in vv)
                )
                scored.append((round(num / den, 6), nid))
            scored.sort(key=lambda t: (-t[0], t[1]))
            return {nid for _, nid in scored[:k]}

        vecs = {i: v for i, v in rows}
        got = {
            r["query_id"]: r
            for r in truncation_recall(
                df, F.col("vec_id") % 10 == 0, k=k, dims_keep=dk
            ).collect()
        }
        for qid in (0, 10, 20):
            want = len(topk(vecs, qid, 6) & topk(vecs, qid, dk))
            assert got[qid]["n_common"] == want, (qid, got[qid], want)
            assert got[qid]["recall_micro"] == want * 1_000_000 // k

    def test_bad_dims_raise(self, spark):
        from snowplow_s3_loader_spark.operators.similarity import (
            truncation_recall,
        )

        df = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="dims_keep"):
            truncation_recall(df, F.col("vec_id") == 0, dims_keep=0)


class TestCharsetMix:
    def _run(self, spark, texts):
        from snowplow_s3_loader_spark.operators.text import charset_mix

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {r["id"]: r for r in charset_mix(df, "doc_id", "text").collect()}

    def test_matches_pure_python_reference(self, spark):
        texts = [
            "abc 123 !?",
            "naïve café ✓",
            "",
            "    ",
            "ALLCAPS",
            "１２３",  # full-width digits are NON-ascii, not digits
        ]
        got = self._run(spark, texts)
        for i, t in enumerate(texts):
            n = len(t)
            if n == 0:
                assert got[i]["n_chars"] == 0
                assert got[i]["letter_micro"] is None
                continue
            letters = sum(1 for c in t if ("a" <= c <= "z") or ("A" <= c <= "Z"))
            digits = sum(1 for c in t if "0" <= c <= "9")
            spaces = t.count(" ")
            nonascii = sum(1 for c in t if ord(c) > 0x7F)
            lm = letters * 1_000_000 // n
            dm = digits * 1_000_000 // n
            sm = spaces * 1_000_000 // n
            nam = nonascii * 1_000_000 // n
            assert (
                got[i]["n_chars"],
                got[i]["letter_micro"],
                got[i]["digit_micro"],
                got[i]["space_micro"],
                got[i]["nonascii_micro"],
                got[i]["other_micro"],
            ) == (n, lm, dm, sm, nam, 1_000_000 - lm - dm - sm - nam), (i, t)

    def test_null_text_is_empty(self, spark):
        from snowplow_s3_loader_spark.operators.text import charset_mix

        df = spark.createDataFrame([(0, None)], "doc_id long, text string")
        [r] = charset_mix(df, "doc_id", "text").collect()
        assert r["n_chars"] == 0 and r["other_micro"] is None


class TestCharLevelProperties:
    """Hypothesis properties over arbitrary unicode text for the two
    char-level operators: the Spark result must match an independent
    python computation of the same integer contract on ANY input, not
    just the curated differential cases."""

    def test_charset_mix_matches_python_on_random_unicode(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from snowplow_s3_loader_spark.operators.text import charset_mix

        # exclude surrogates (invalid in UTF-8 transport); everything
        # else — emoji, CJK, controls, combining marks — is fair game
        texts = st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x10FFF
                ),
                max_size=40,
            ),
            min_size=1,
            max_size=25,
        )

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(texts)
        def run(ts):
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(ts)], "doc_id long, text string"
            )
            got = {
                r["id"]: r for r in charset_mix(df, "doc_id", "text").collect()
            }
            for i, t in enumerate(ts):
                n = len(t)
                if n == 0:
                    assert got[i]["n_chars"] == 0
                    assert got[i]["other_micro"] is None
                    continue
                letters = sum(
                    1 for c in t if "a" <= c <= "z" or "A" <= c <= "Z"
                )
                digits = sum(1 for c in t if "0" <= c <= "9")
                spaces = t.count(" ")
                nonascii = sum(1 for c in t if ord(c) > 0x7F)
                lm = letters * 1_000_000 // n
                dm = digits * 1_000_000 // n
                sm = spaces * 1_000_000 // n
                nam = nonascii * 1_000_000 // n
                assert (
                    got[i]["letter_micro"],
                    got[i]["digit_micro"],
                    got[i]["space_micro"],
                    got[i]["nonascii_micro"],
                    got[i]["other_micro"],
                ) == (lm, dm, sm, nam, 1_000_000 - lm - dm - sm - nam), (
                    i,
                    repr(t),
                )
                assert got[i]["other_micro"] >= 0

        run()

    def test_char_entropy_matches_python_on_random_unicode(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from snowplow_s3_loader_spark.operators.text import char_entropy

        texts = st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x10FFF
                ),
                max_size=30,
            ),
            min_size=1,
            max_size=20,
        )

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(texts)
        def run(ts):
            from collections import Counter

            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(ts)], "doc_id long, text string"
            )
            got = {
                r["id"]: r
                for r in char_entropy(df, "doc_id", "text").collect()
            }
            for i, t in enumerate(ts):
                c = Counter(t)
                n = len(t)
                if n == 0:
                    assert got[i]["entropy_micro"] is None
                    continue
                s = sum(
                    cnt * int(_round_half_up(math.log(cnt) * 1_000_000))
                    for cnt in c.values()
                )
                em = int(_round_half_up(math.log(n) * 1_000_000)) - s // n
                assert (
                    got[i]["n_chars"],
                    got[i]["n_distinct_chars"],
                    got[i]["entropy_micro"],
                ) == (n, len(c), em), (i, repr(t))

        run()
