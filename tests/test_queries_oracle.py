"""Local twin of the driver's correctness gate: run every queries() entry on
sf0.001 and compare against its DuckDB oracle — row count, column names, and
values (exact for non-floats, 1e-9 for floats; floats are pre-rounded in the
queries themselves so this is belt-and-braces)."""

from __future__ import annotations

import math

import duckdb
import pytest

from snowplow_s3_loader_spark.plans.oracles import ORACLES
from snowplow_s3_loader_spark.plans.queries import QUERIES
from snowplow_s3_loader_spark.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in sorted(columns):
            v = row[c] if not isinstance(row, tuple) else row[columns.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_rows = qdf.collect()
    spark_cols = qdf.columns

    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only contract
        return

    rel = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"

    s_norm = _normalize([r.asDict() for r in spark_rows], spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if not _row_eq(a, b)
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def _row_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9) or (math.isnan(x) and math.isnan(y))):
                return False
        elif x != y:
            return False
    return True
