"""Declared query contract: each named query exists twice — as a Spark
DataFrame plan (queries.py) and as ANSI SQL for the DuckDB oracle
(oracles.py). SURVEY.md SS2.4 defines the set.
"""

from snowplow_s3_loader_spark.plans.queries import QUERIES  # noqa: F401
from snowplow_s3_loader_spark.plans.oracles import ORACLES  # noqa: F401
