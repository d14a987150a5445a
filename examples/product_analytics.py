"""Worked example: the product-analytics surface over the events table —
the questions a warehouse downstream of the loader answers daily.

  1. profile the raw drop (schema-drift / data-quality gate)
  2. conversion funnel view -> click -> purchase
  3. weekly cohort retention
  4. frequent event-type pairs per (user, day) basket
  5. robust outlier screen on event values

Run:  PYTHONPATH=. python examples/product_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators import behavior
from snowplow_s3_loader_spark.operators.profile import profile_table
from snowplow_s3_loader_spark.operators.timeseries import robust_outliers
from snowplow_s3_loader_spark.session import get_spark
from snowplow_s3_loader_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="product-analytics")
    ev = load_table(spark, sf_dir, "events")

    print("== table profile ==")
    profile_table(ev, ["event_id", "ts", "user_id", "event_type", "value"]).orderBy(
        "column"
    ).show(truncate=False)

    print("== funnel view -> click -> purchase ==")
    fun = behavior.funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    behavior.funnel_summary(fun, 3).orderBy("step").show()

    print("== weekly cohort retention ==")
    behavior.cohort_retention(ev, "user_id", "ts", "week").orderBy(
        "cohort", "period"
    ).show(8)

    print("== frequent event-type pairs per (user, day) ==")
    baskets = ev.select(
        F.concat_ws(
            "@", F.col("user_id").cast("string"),
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"),
        ).alias("basket"),
        "event_type",
    )
    behavior.frequent_pairs(baskets, "basket", "event_type", 5).orderBy(
        F.col("support").desc()
    ).show(5)

    print("== value outliers per event type (median/MAD) ==")
    robust_outliers(ev, ["event_type"], "value").orderBy("event_type").show()
    spark.stop()


if __name__ == "__main__":
    main()
