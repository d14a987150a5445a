"""Round-9 widening: OHLC/TWAP bars (plus the operators added later in
the round). Differential tests pin the exact semantics the oracle
replays: total-order open/close at tied timestamps, sign-separated
truncating TWAP division, last-tick-holds-to-bar-end durations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.timeseries import ohlc_bars

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _mk(spark, rows):
    """rows: (key, ts, cents, tiebreak)"""
    return spark.createDataFrame(
        [(k, t, c, tb) for k, t, c, tb in rows],
        "k string, ts timestamp_ntz, cents long, tb long",
    )


def _bars(df):
    return {
        (r["k"], r["bucket"]): r
        for r in ohlc_bars(df, ["k"], "ts", "cents", "tb", "hour").collect()
    }


class TestOhlcBars:
    def test_basic_bar(self, spark):
        # three ticks in one hour bar: 10:00 c=5, 10:15 c=9, 10:45 c=2
        df = _mk(
            spark,
            [
                ("a", T0, 5, 1),
                ("a", T0 + dt.timedelta(minutes=15), 9, 2),
                ("a", T0 + dt.timedelta(minutes=45), 2, 3),
            ],
        )
        b = _bars(df)[("a", T0)]
        assert (b["open_cents"], b["close_cents"]) == (5, 2)
        assert (b["high_cents"], b["low_cents"]) == (9, 2)
        assert b["n_ticks"] == 3
        # durations: 15m, 30m, 15m (last tick holds to 11:00 bar end)
        us = 60_000_000
        assert b["twap_den"] == 60 * us
        assert b["twap_num"] == 5 * 15 * us + 9 * 30 * us + 2 * 15 * us
        assert b["twap_cents"] == b["twap_num"] // b["twap_den"]

    def test_tie_at_bar_boundary_total_order(self, spark):
        # two ticks with the IDENTICAL timestamp: the tiebreak column
        # decides open (lowest tb) and close (highest tb), so the bar is
        # deterministic regardless of partition merge order
        df = _mk(spark, [("a", T0, 7, 2), ("a", T0, 3, 1)])
        b = _bars(df)[("a", T0)]
        assert b["open_cents"] == 3 and b["close_cents"] == 7
        # tick 1 (tb=1) holds 0us to the tied next tick; tick 2 holds
        # the whole hour
        assert b["twap_den"] == 3_600_000_000
        assert b["twap_num"] == 7 * 3_600_000_000

    def test_single_tick_bar(self, spark):
        # one tick mid-bar: open=close=high=low, duration to bar end
        df = _mk(spark, [("a", T0 + dt.timedelta(minutes=40), 11, 1)])
        b = _bars(df)[("a", T0)]
        assert (
            b["open_cents"]
            == b["close_cents"]
            == b["high_cents"]
            == b["low_cents"]
            == 11
        )
        assert b["n_ticks"] == 1
        assert b["twap_den"] == 20 * 60_000_000
        assert b["twap_cents"] == 11

    def test_negative_cents_truncates_toward_zero(self, spark):
        # twap_num = -5 * 40m + 2 * 20m = -160m (in cents*us),
        # den = 60m -> exact ratio -8/3 = -2.666..; div must truncate
        # toward zero (-2), NOT floor (-3) — the engine-parity rule
        us = 60_000_000
        df = _mk(
            spark,
            [("a", T0, -5, 1), ("a", T0 + dt.timedelta(minutes=40), 2, 2)],
        )
        b = _bars(df)[("a", T0)]
        assert b["twap_num"] == -160 * us
        assert b["twap_den"] == 60 * us
        assert b["twap_cents"] == -2

    def test_bars_split_on_hour_and_key(self, spark):
        df = _mk(
            spark,
            [
                ("a", T0, 1, 1),
                ("a", T0 + dt.timedelta(hours=1), 2, 2),
                ("b", T0, 3, 3),
            ],
        )
        bars = _bars(df)
        assert set(bars) == {
            ("a", T0),
            ("a", T0 + dt.timedelta(hours=1)),
            ("b", T0),
        }
        assert all(b["twap_den"] == 3_600_000_000 for b in bars.values())

    def test_int64_bound_enforced(self, spark):
        df = _mk(spark, [("a", T0, 2**42, 1)])
        with pytest.raises(ValueError, match="int64 bound"):
            ohlc_bars(df, ["k"], "ts", "cents", "tb", "day")

    def test_bad_unit_rejected(self, spark):
        df = _mk(spark, [("a", T0, 1, 1)])
        with pytest.raises(ValueError, match="unit must be one of"):
            ohlc_bars(df, ["k"], "ts", "cents", "tb", "fortnight")
