"""Edit-distance join (PassJoin segment blocking) — brute-force
differentials, short-string path, tau=0 exact path, and the
no-cartesian plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.linkage import (
    edit_distance_join,
    edit_distance_self_join,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


MESSY = [
    "kitten", "sitting", "kittens", "mitten", "kitte", "kitchen",
    "acme corp", "acme corp.", "acmee corp", "acme  corp", "ACME corp",
    "a", "b", "ab", "", "abc", "abcd", "xyzzy", "zyzzy", "xyzy",
    "the quick brown fox", "the quick brown fix", "the quikc brown fox",
]


@pytest.mark.parametrize("tau", [0, 1, 2])
def test_self_join_matches_brute_force(spark, tau):
    rows = [(i, s) for i, s in enumerate(MESSY)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_self_join(df, "id", "name", tau).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= tau
    }
    assert got == want


def test_two_table_join_matches_brute_force(spark):
    left = [(i, s) for i, s in enumerate(MESSY[:12])]
    right = [(100 + i, s) for i, s in enumerate(MESSY[8:])]
    l_df = spark.createDataFrame(left, "lid long, lname string")
    r_df = spark.createDataFrame(right, "rid long, rname string")
    got = {
        (r.lid, r.rid, r.distance)
        for r in edit_distance_join(
            l_df, r_df, "lid", "lname", "rid", "rname", tau=2
        ).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in left
        for j, b in right
        if _lev(a, b) <= 2
    }
    assert got == want


def test_short_strings_take_the_banded_path(spark):
    # indexed strings shorter than tau+1 chars (incl. empty) still match
    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "xy"), (5, "b")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_self_join(df, "id", "name", tau=1).collect()
    }
    want = {
        (i, j) for i, a in rows for j, b in rows if i < j and _lev(a, b) <= 1
    }
    assert got == want


def test_nulls_are_dropped_and_clashing_columns_raise(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "abd")], "id long, name string"
    )
    got = edit_distance_self_join(df, "id", "name", tau=1).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 3)}
    with pytest.raises(ValueError, match="distinct"):
        edit_distance_join(df, df, "id", "name", "id", "name", 1)
    with pytest.raises(ValueError, match="tau"):
        edit_distance_self_join(df, "id", "name", -1)


def test_pair_generation_is_never_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"name {i:04d}") for i in range(50)], "id long, name string"
    )
    plan = edit_distance_self_join(df, "id", "name", 1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st

small_corpus = st.lists(
    st.text(alphabet="ab", max_size=5), min_size=2, max_size=25, unique=True
)


@settings(max_examples=5, deadline=None)
@given(corpus=small_corpus, tau=st.integers(0, 2))
def test_property_matches_brute_force(spark, corpus, tau):
    """Tiny-alphabet corpora maximize blocking edge cases: empty
    strings, shared segments, every length band. Both blocking schemes
    (deletion for tau<=1, segment for tau=2) must agree with the DP
    reference exactly."""
    rows = [(i, s) for i, s in enumerate(corpus)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_self_join(df, "id", "name", tau).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= tau
    }
    assert got == want
