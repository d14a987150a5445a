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


def _local_checkpoint_ids(spark) -> set[int]:
    """Ids of currently persisted localCheckpoint RDDs (the id-SET
    discipline — sizes flake under the async ContextCleaner)."""
    jsc = spark.sparkContext._jsc.sc()
    lst = jsc.getPersistentRDDs().toList()
    return {
        lst.apply(i)._1()
        for i in range(lst.size())
        if "localCheckpoint" in lst.apply(i)._2().toString()
    }


class TestNarrowRankingInputMaterialization:
    """Change 10 (round 13): token_shards and spearman_moments
    materialize a NARROW proxy once instead of letting the ranking
    contract re-evaluate an expensive input plan per pass."""

    def test_token_shards_weight_plan_evaluated_once(self, spark):
        # The two-phase ranking evaluates its input per pass — before
        # change 10 an expensive weight projection (q147: a corpus
        # tokenize) ran on BOTH weight-reading passes. An accumulator
        # inside the weight UDF counts evaluations: with the narrow
        # (id, weight) checkpoint it must run exactly once per row.
        from pyspark.sql.types import LongType

        from snowplow_s3_loader_spark.operators.layout import token_shards

        acc = spark.sparkContext.accumulator(0)

        def counted_weight(v):
            acc.add(1)
            return v % 90 + 1

        w_udf = F.udf(counted_weight, LongType())
        n = 300
        docs = spark.range(1, n + 1).select(
            F.col("id").alias("doc_id"), w_udf(F.col("id")).alias("w")
        )
        out = token_shards(docs, "doc_id", "w", 8)
        from snowplow_s3_loader_spark.operators.dedup import (
            release_materialized,
        )

        try:
            # noop sink, NOT count(): count() lets Catalyst prune the weight
            # column out of the ranking's output pass, which silently hides
            # one of the two pre-change evaluations (guide §1.4)
            out.write.format("noop").mode("overwrite").save()
            # exactness assumes each row is computed once — true under
            # deterministic local[4] with no task retries or speculation;
            # if the test conf ever enables either, relax to a range
            assert acc.value == n, (
                f"weight plan evaluated {acc.value} times for {n} rows — "
                "the narrow-proxy checkpoint must pay the projection once"
            )
        finally:
            # don't leak the proxy blocks into the session-scoped fixture
            release_materialized(out)

    def test_spearman_releases_base_blocks(self, spark):
        # the 3-column base checkpoint is released as soon as the
        # x-ranked frame is materialized: at most rx + ry (2 blocks)
        # may outlive the call
        from snowplow_s3_loader_spark.operators.profile import (
            spearman_moments,
        )

        before = _local_checkpoint_ids(spark)
        df = spark.range(1, 400).select(
            F.col("id").alias("rid"),
            (F.col("id") * 7 % 50).alias("x"),
            (F.col("id") * 13 % 50).alias("y"),
        )
        row = spearman_moments(df, "x", "y", "rid").collect()[0]
        assert row["n"] == 399
        added = _local_checkpoint_ids(spark) - before
        try:
            # self-checking bounds (ADVICE r13): rx and ry MUST both
            # persist, so a filter that matches nothing (e.g. an RDD
            # toString change after a Spark bump) fails loudly instead
            # of passing vacuously
            assert 1 <= len(added) <= 2, (
                f"{len(added)} localCheckpoint blocks outlive "
                "spearman_moments — expected the rx/ry pair only"
            )
        finally:
            # release the surviving blocks instead of leaking them into
            # the session-scoped fixture (ADVICE r13)
            jsc = spark.sparkContext._jsc.sc()
            lst = jsc.getPersistentRDDs().toList()
            for i in range(lst.size()):
                if lst.apply(i)._1() in added:
                    lst.apply(i)._2().unpersist(False)

    def test_spearman_bound_rejection_pays_no_checkpoint(self, spark):
        # the n-bound is enforced from one cheap count BEFORE the
        # materialization: the rejection path must not persist anything
        from snowplow_s3_loader_spark.operators.profile import (
            spearman_moments,
        )

        before = _local_checkpoint_ids(spark)
        df = spark.range(1_300_001).select(
            F.col("id").alias("rid"),
            F.col("id").alias("x"),
            F.col("id").alias("y"),
        )
        with pytest.raises(ValueError, match="exceeds the exact int64"):
            spearman_moments(df, "x", "y", "rid")
        assert _local_checkpoint_ids(spark) - before == set()
