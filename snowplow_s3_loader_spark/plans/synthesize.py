"""Synthesize loader-format lines (SDJ / enriched TSV) from the `events`
table, deterministically — the loader-path queries (SURVEY.md SS2.4 Q14-Q20)
run the reference's parse semantics over these.

The exact same construction is written in SQL inside the oracle, so both
engines parse identical inputs.

Line mix (m = event_id % 10):
  m == 0 -> SDJ missing `schema` field      (bad: INVALID_DATA_PAYLOAD)
  m == 5 -> truncated JSON                  (bad: can't parse JSON)
  else   -> valid SDJ with iglu URI
            iglu:com.acme/<event_type>/jsonschema/1-0-<event_id%3>
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SDJ_VENDOR = "com.acme"
TRUNCATED_LINE = '{"schema": "iglu:com.acme/trunc'


def sdj_line(event_id: Column, event_type: Column, props: Column) -> Column:
    m = event_id % 10
    valid = F.concat(
        F.lit('{"schema": "iglu:com.acme/'),
        event_type,
        F.lit("/jsonschema/1-0-"),
        (event_id % 3).cast("string"),
        F.lit('", "data": '),
        props,
        F.lit("}"),
    )
    missing = F.concat(F.lit('{"data": '), props, F.lit("}"))
    return F.when(m == 0, missing).when(m == 5, F.lit(TRUNCATED_LINE)).otherwise(valid)


def sdj_lines(events: DataFrame) -> DataFrame:
    return events.select(
        "event_id",
        "ts",
        sdj_line(F.col("event_id"), F.col("event_type"), F.col("props")).alias("value"),
    )


def enriched_line(event_type: Column, ts: Column) -> Column:
    """Minimal enriched TSV: idx0=app, idx1=platform, idx2='', idx3=collector
    tstamp formatted 'yyyy-MM-dd HH:mm:ss' (FIXTURES.md F1)."""
    return F.concat(
        event_type,
        F.lit("\tweb\t\t"),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
    )


def enriched_lines(events: DataFrame) -> DataFrame:
    return events.select(
        "event_id",
        "ts",
        enriched_line(F.col("event_type"), F.col("ts")).alias("value"),
    )


# SQL twin (DuckDB) of sdj_line, used by every loader-path oracle.
SDJ_LINE_SQL = """
    CASE
      WHEN event_id % 10 = 0 THEN '{"data": ' || props || '}'
      WHEN event_id % 10 = 5 THEN '{"schema": "iglu:com.acme/trunc'
      ELSE '{"schema": "iglu:com.acme/' || event_type || '/jsonschema/1-0-'
           || CAST(event_id % 3 AS VARCHAR) || '", "data": ' || props || '}'
    END
"""

ENRICHED_LINE_SQL = """
    event_type || chr(9) || 'web' || chr(9) || chr(9) || strftime(ts, '%Y-%m-%d %H:%M:%S')
"""
