"""User-facing engine facade — the thin `engine.sql()` / DataFrame surface
over the synthetic tables plus the loader operators (SURVEY.md SS7.7).

A user of the reference gets a streaming loader; a user of this engine
additionally gets the full Spark SQL surface over their data:

    eng = Engine.at(spark, "/root/testdata/sf0.01")
    eng.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
    eng.table("events").groupBy("event_type").count()
    eng.classify_sdj(lines_df)          # loader parse stage as a library call
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from snowplow_s3_loader_spark.operators.parse import (
    PURPOSE_ENRICHED,
    PURPOSE_SDJ,
    classify,
)
from snowplow_s3_loader_spark.session import tune_session
from snowplow_s3_loader_spark.tables import register_tables


class Engine:
    def __init__(self, spark: SparkSession, tables: dict[str, DataFrame]):
        self.spark = spark
        self.tables = tables

    @classmethod
    def at(cls, spark: SparkSession, sf_dir: str) -> "Engine":
        tune_session(spark)
        return cls(spark, register_tables(spark, sf_dir))

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def classify_sdj(self, lines: DataFrame, value_col: str = "value") -> DataFrame:
        return classify(lines, PURPOSE_SDJ, value_col)

    def classify_enriched(self, lines: DataFrame, value_col: str = "value") -> DataFrame:
        return classify(lines, PURPOSE_ENRICHED, value_col)
