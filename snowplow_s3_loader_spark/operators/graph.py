"""Connected components over near-duplicate pair graphs — the step that
turns pairwise dedup output (token_jaccard_pairs / lsh_candidate_pairs /
embedding_near_dup) into dedup CLUSTERS, so a pipeline can keep one
canonical document per cluster. (Beyond the reference's surface —
SURVEY.md SS7.8 training-data extensions; the reference loader has no
relational layer at all, Processing.scala:69-77.)

Algorithm: iterative min-label propagation. Every vertex starts labeled
with itself; each round every vertex takes the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed equals
the graph diameter — near-dup clusters are small and dense (diameter is
single digits), which makes plain propagation the right trade here. For
general billion-edge graphs with long chains, the alternating
large-star/small-star formulation (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log n) rounds with the
same join-shape per round; the loop below is deliberately the simple
variant with a max_iter guard.

Scale mechanics:
- each iteration is one shuffle join (edges x labels) + one aggregation —
  both keyed, both AQE-coalesced;
- lineage is truncated every round via eager localCheckpoint (iterative
  Spark plans otherwise grow an exponential DAG), and the previous
  round's blocks are released immediately, so storage is bounded at
  2 x |V| rows regardless of iteration count;
- the convergence check is a count() on changed labels — one tiny action
  per round, the standard cost of driver-controlled iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.dedup import release_materialized


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; component is
    the minimum node id reachable through the pair graph — a stable,
    engine-portable cluster id. Raises if max_iter rounds don't converge
    (a diameter that large means the input is not a near-dup pair set)."""
    edges = (
        pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
        .union(pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round: compute once
    )
    labels = (
        edges.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("lbl", F.col("v"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            neigh = (
                edges.join(labels, edges.d == labels.v)
                .groupBy("s")
                .agg(F.min("lbl").alias("nl"))
            )
            new_labels = (
                labels.join(neigh, labels.v == neigh.s, "left")
                .select(
                    "v",
                    F.least(F.col("lbl"), F.coalesce("nl", F.col("lbl"))).alias(
                        "lbl"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
                .where(F.col("n.lbl") != F.col("o.lbl"))
                .count()
            )
            release_materialized(labels)
            labels = new_labels
            if changed == 0:
                return labels.select(
                    F.col("v").alias("node"), F.col("lbl").alias("component")
                )
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds "
            "(graph diameter too large for min-label propagation; use a "
            "large-star/small-star formulation)"
        )
    finally:
        release_materialized(edges)


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The full near-dup dedup step: drop every document that belongs to a
    pair cluster but is not its canonical (minimum-id) member. Documents
    in no cluster pass through untouched — one left-anti join against the
    (small) non-canonical member list."""
    comps = connected_components(pairs, id_a, id_b)
    losers = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
