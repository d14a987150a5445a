"""Two-phase global ranking parity vs the single-partition Window it
replaces (operators/ranking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators import ranking


def _df(spark, n=257):
    # values with heavy ties; id is the unique tiebreak
    return spark.createDataFrame(
        [(i, (i * 7919) % 40) for i in range(n)], "id long, v int"
    )


def test_global_row_number_matches_window(spark):
    df = _df(spark)
    got, total = ranking.global_row_number(
        df,
        [F.col("v"), F.col("id")],
        rn_col="rn",
        num_partitions=7,
        descending=[True, False],
    )
    assert total == 257
    expected = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("id")))
    )
    assert {(r["id"], r["rn"]) for r in got.collect()} == {
        (r["id"], r["rn"]) for r in expected.collect()
    }


@pytest.mark.parametrize("n,k", [(257, 4), (100, 4), (102, 4), (3, 4), (8, 3), (1, 2)])
def test_ntile_closed_form_matches_window(spark, n, k):
    df = _df(spark, n)
    got, total = ranking.global_row_number(
        df,
        [F.col("v"), F.col("id")],
        rn_col="rn",
        num_partitions=5,
        descending=[True, False],
    )
    got = got.withColumn("nt", ranking.ntile_from_row_number(F.col("rn"), total, k))
    expected = df.withColumn(
        "nt", F.ntile(k).over(Window.orderBy(F.desc("v"), F.asc("id")))
    )
    assert {(r["id"], r["nt"]) for r in got.collect()} == {
        (r["id"], r["nt"]) for r in expected.collect()
    }


def test_global_row_number_empty(spark):
    df = spark.createDataFrame([], "id long, v int")
    got, total = ranking.global_row_number(df, [F.col("id")])
    assert total == 0 and got.count() == 0
