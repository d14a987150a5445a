"""Similarity search over embedding columns (array<float>) — brute-force
cosine top-k baseline + LSH(SRP)-bucketed approximate variant
(SURVEY.md SS7.8).

Scale notes (100 TB):
  - brute-force: the query side is broadcast (queries << corpus); the corpus
    is scanned once, no shuffle of the corpus, top-k via window per query
    (AQE picks the aggregation). Dot products run in JVM codegen via
    zip_with/aggregate — no Python on the hot path.
  - SRP-LSH: each vector maps to a small bucket code (sign bits of dot
    products with fixed hyperplanes); candidate search joins on the bucket
    code so the pair space shrinks ~2^n_planes-fold. Hyperplanes are a
    deterministic seeded numpy matrix inlined as literals (no SparkContext
    broadcast needed at this size; at larger plane counts use a broadcast
    join against a tiny planes table).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Elementwise-ordered dot product (left-to-right accumulation — same
    order as the oracle's list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _cosine_batch(a, b):
    import numpy as np
    import pandas as pd

    A = np.array(a.tolist(), dtype=np.float64)
    B = np.array(b.tolist(), dtype=np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(num / den)


_cosine_udf_cache: list = []


def _cosine_udf(a: Column, b: Column) -> Column:
    # pandas_udf registration needs an active SparkSession -> lazy, cached
    if not _cosine_udf_cache:
        _cosine_udf_cache.append(F.pandas_udf(_cosine_batch, "double"))
    return _cosine_udf_cache[0](a, b)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity — Arrow-vectorized numpy (pandas_udf).

    Spark's aggregate/zip_with higher-order functions evaluate element-wise
    interpreted (~60x slower here: 7.4s -> 0.6s on 200k 64-dim pairs);
    one einsum per Arrow batch keeps the math in C. numpy's pairwise
    summation differs from sequential accumulation by ~1e-15 relative —
    far inside the round-6 oracle tolerance."""
    return _cosine_udf(a, b)


def cosine_expr(a: Column, b: Column) -> Column:
    """Pure-expression cosine (no Python workers) — for contexts where a
    pandas_udf can't run or a literal plane is involved."""
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector against the whole corpus.

    Ranking key is (round(cos,6) DESC, corpus id ASC) — fully deterministic
    and engine-independent, so ties at the k boundary resolve identically
    in the oracle.
    """
    queries = emb.filter(query_pred).select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv"))
    scored = corpus.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def srp_planes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic signed-random-projection hyperplanes."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket code: integer whose bit p = sign(vec . plane_p)."""
    code = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, lit_plane) >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        code = code + bit
    return code


def ann_topk_srp(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine but only among bucket-collision
    candidates. A single table's recall falls ~2x per extra plane (each
    bit halves the bucket), so `n_tables` independent plane sets can be
    unioned in the classic multi-table LSH trade: a candidate survives if
    it collides in ANY table, recall ~ 1-(1-p)^L for per-table collision
    probability p, candidate volume grows ~L-fold (still bucket-bounded,
    never all-pairs). Plane sets are seeded `seed+t`, so any (n_planes,
    n_tables, seed) choice is reproducible in an oracle.

    Scale shape: one explode over table index (corpus rows ship L times —
    the standard LSH storage trade), one (table, bucket)-keyed join with
    broadcast queries, distinct on (query, candidate), then exact scoring.
    """
    base = emb.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    bucket_cols = [
        F.struct(
            F.lit(t).alias("t"),
            srp_bucket(F.col("v"), srp_planes(dim, n_planes, seed + t)).alias("b"),
        )
        for t in range(n_tables)
    ]
    hashed = base.select(
        "id", "v", F.explode(F.array(*bucket_cols)).alias("tb")
    ).select("id", "v", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    q_base = base.filter(query_pred).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    # recompute the query buckets on the (tiny) filtered side rather than
    # filtering `hashed`: pred resolution stays on `base`'s columns and the
    # corpus-side explode is never re-evaluated for the broadcast
    q_hashed = (
        base.filter(query_pred)
        .select(F.col("id").alias("query_id"), F.explode(F.array(*bucket_cols)).alias("tb"))
        .select("query_id", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    )
    candidates = (
        hashed.join(F.broadcast(q_hashed), on=["t", "b"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "v")
        .distinct()  # a pair may collide in several tables: score once
    )
    scored = candidates.join(F.broadcast(q_base), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 7,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Train IVF centroids with MLlib k-means|| (JVM, distributed init +
    Lloyd iterations). Vectors are L2-normalized first so euclidean k-means
    approximates spherical (cosine) clustering — the assignment metric used
    downstream. Returns a K-row DataFrame (centroid_id int, cv
    array<double>) small enough to broadcast.

    At corpus scale, pass `sample_fraction` to train on a uniform sample
    (centroid quality converges long before the full corpus is seen; the
    assignment step still scans everything exactly once)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = emb.select(as_double(F.col(vec_col)).alias("v"))
    if sample_fraction is not None and sample_fraction < 1.0:
        base = base.sample(withReplacement=False, fraction=sample_fraction, seed=seed)
    unit = base.select(
        F.transform("v", lambda x: x / F.sqrt(dot(F.col("v"), F.col("v")))).alias("v")
    )
    train = unit.select(array_to_vector(F.col("v")).alias("features"))
    # init_mode: k-means|| is the scale-correct default; "random" trades
    # init quality for ~3 fewer scheduled jobs (worth it when K is small
    # relative to a well-spread corpus)
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter, initMode=init_mode).fit(
        train
    )
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return emb.sparkSession.createDataFrame(
        centers, "centroid_id int, cv array<double>"
    )


def train_ivf_centroids_sampled(
    emb: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    sample_size: int = 2048,
    seed: int = 7,
    max_iter: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Sampled spherical k-means on the driver (numpy Lloyd over a bounded,
    hash-ordered sample) — the standard IVF training recipe: centroid
    quality converges on a few thousand points, so shipping the sample to
    the driver (sample_size x dim floats, ~1 MB) beats paying MLlib's
    per-iteration job overhead when K is small. Deterministic for a fixed
    seed: the sample is the first `sample_size` vectors by md5(id) (stable
    pseudo-random order in any engine), init is a seeded choice.

    Use train_ivf_centroids (kmeans||) instead when K or the needed sample
    no longer fits a driver comfortably."""
    rows = (
        emb.select(
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            as_double(F.col(vec_col)).alias("v"),
        )
        .orderBy("_h")
        .limit(sample_size)
        .select("v")
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(max_iter):
        assign = np.argmax(X @ C.T, axis=1)  # cosine == dot on unit vectors
        moved = False
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                nc = members.mean(axis=0)
                nc /= max(np.linalg.norm(nc), 1e-12)
                if not np.allclose(nc, C[j]):
                    moved = True
                C[j] = nc
        if not moved:
            break
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(C)]
    return emb.sparkSession.createDataFrame(
        centers, "centroid_id int, cv array<double>"
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF-style bucketing. Centroids come from `centroids` (typically
    train_ivf_centroids' sampled k-means||) or, when None, a trivial
    deterministic seeding (first `n_centroids` vectors by id) useful for
    fixture-stable tests. Returns (assignments(id, v, centroid_id),
    centroids).

    The assignment is a broadcast of K centroids against one corpus scan —
    no shuffle; the resulting centroid_id column is the partition key for
    search.
    """
    base = emb.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    if centroids is None:
        centroids = (
            base.orderBy("id").limit(n_centroids)
            .select(F.col("id").alias("centroid_id"), F.col("v").alias("cv"))
        )
    # argmax per Arrow batch against the K collected centroids (K is small
    # by contract — it already fits the driver during training): one GEMM
    # per batch, ZERO shuffle and no K-fold row blowup. The previous shape
    # (broadcast join -> K rows per vector -> per-id window) shuffled 8x
    # the corpus to rank 8 numbers — measured 3.9s -> ~0.8s at sf0.1.
    # Ties pick the first (lowest) centroid_id, matching the old
    # (desc sim, asc centroid_id) window order.
    cent_rows = centroids.orderBy("centroid_id").collect()
    cent_ids = [r["centroid_id"] for r in cent_rows]
    C = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    ctype = centroids.schema["centroid_id"].dataType.simpleString()
    itype = base.schema["id"].dataType.simpleString()

    def _assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            idx = np.argmax(Vn @ Cn.T, axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "v": pdf["v"],
                    "centroid_id": [cent_ids[i] for i in idx],
                }
            )

    assignments = base.mapInPandas(
        _assign, schema=f"id {itype}, v array<double>, centroid_id {ctype}"
    )
    return assignments, centroids


def ann_topk_ivf(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    train: bool = False,
    sample_fraction: float | None = None,
    seed: int = 7,
    max_iter: int = 20,
    init_mode: str = "k-means||",
    trainer: str = "sampled",
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose centroid is among the
    query's `n_probe` nearest centroids. Pair space shrinks ~K/n_probe-fold;
    recall grows with n_probe (n_probe=K degenerates to brute force).
    Default n_probe=4 comes from the measured recall table
    (scripts/weak_scaling.py recall: 0.78@4 vs 0.49@2 at sf0.1, K=8).
    `train=True` trains centroids with sampled k-means (the recall-correct
    path — first-K seeding degrades on clustered corpora): driver-side
    numpy Lloyd over a bounded sample by default, MLlib kmeans|| when
    `trainer="kmeans||"` (large K / large sample)."""
    if centroids is None and train:
        if trainer == "kmeans||":
            centroids = train_ivf_centroids(
                emb, n_centroids, vec_col,
                sample_fraction=sample_fraction, seed=seed, max_iter=max_iter,
                init_mode=init_mode,
            )
        else:
            centroids = train_ivf_centroids_sampled(
                emb, n_centroids, vec_col, seed=seed, max_iter=max_iter,
                id_col=id_col,
            )
    assignments, centroids = ivf_assign(emb, n_centroids, id_col, vec_col, centroids)
    query_ids = emb.filter(query_pred).select(F.col(id_col).alias("id"))
    queries = assignments.join(F.broadcast(query_ids), on="id").select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    # probe lists: each query's n_probe closest centroids
    qc = queries.join(F.broadcast(centroids)).select(
        "query_id", "qv", "centroid_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = assignments.join(F.broadcast(probes), on="centroid_id").filter(
        F.col("id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_recall_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
    max_queries: int = 4096,
) -> DataFrame:
    """Recall@k audit of trained IVF against exact brute force, computed
    from ONE corpus scan (round-5 VERDICT #3: the q48 composition ran the
    IVF chain and the brute-force baseline as two independent scans of
    `emb` — the scored pair frame is identical work, so share it).

    Mechanics: centroids come from the usual sampled driver Lloyd; the
    query set (everything matching `query_pred`) is collected and
    broadcast as a numpy block. An audit runs on a bounded sample by
    design, so more than `max_queries` matches RAISES (no silent caps —
    a truncated query set would score the overflow as recall failures);
    tighten the predicate or raise the bound explicitly. A single mapInPandas pass
    then, per Arrow batch, (a) assigns each corpus vector's nearest
    centroid (GEMM argmax — same math as ivf_assign) and (b) scores it
    against ALL queries (one GEMM), emitting (query_id, neighbor_id,
    cos_sim, in_probe) where in_probe says the neighbor's cell is among
    that query's n_probe closest centroids (probe lists are a q x K
    driver-side argsort of the same normalized dot). Exact top-k ranks
    the full frame; IVF top-k ranks the in_probe subset — identical
    ranking keys (round(cos,6) DESC, neighbor_id ASC) to
    brute_force_topk / ann_topk_ivf. Returns one row per query:
    (query_id, n_hits) with n_hits = |ivf top-k ∩ exact top-k|
    (0 for queries whose probe cells held no candidates).

    Scale shape: the pair frame is |queries| x |corpus| rows — the
    brute-force audit cost, which is the point of a recall report; the
    corpus ships ONCE, queries/centroids are driver-bounded, and the two
    rankings reuse the same shuffle-free scored frame (two windows over
    the same partitionBy key plan back-to-back)."""
    centroids = train_ivf_centroids_sampled(
        emb, n_centroids, vec_col, seed=seed, max_iter=max_iter, id_col=id_col
    )
    cent_rows = centroids.orderBy("centroid_id").collect()
    cent_ids = np.array([r["centroid_id"] for r in cent_rows])
    C = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    itype = emb.schema[id_col].dataType.simpleString()
    q_rows = (
        emb.filter(query_pred)
        .select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .orderBy("qid")
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"ivf_recall_topk: query_pred matches more than max_queries="
            f"{max_queries} vectors — a silently truncated audit would score "
            "the overflow queries as recall failures; tighten the predicate "
            "or raise max_queries explicitly"
        )
    if not q_rows:
        # same query_id type as the non-empty path — schema must not
        # depend on whether the predicate matched
        return emb.sparkSession.createDataFrame([], f"query_id {itype}, n_hits long")
    qids = np.array([r["qid"] for r in q_rows])
    Q = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # per-query probe cells: n_probe largest by (sim DESC, centroid_id ASC)
    qsim = Qn @ Cn.T  # (q, K)
    order = np.lexsort((np.broadcast_to(cent_ids, qsim.shape), -qsim), axis=1)
    probe_mask = np.zeros_like(qsim, dtype=bool)  # (q, K) by centroid POSITION
    rows_idx = np.arange(len(qids))[:, None]
    probe_mask[rows_idx, order[:, : min(n_probe, len(cent_ids))]] = True

    def _score(batches):
        import pandas as pd

        # bound per-yield memory: the pair block is (q_chunk x B), never
        # the full (max_queries x B) — at the 4096-query bound the
        # unchunked version held >1 GB of transient arrays per task
        q_chunk = 128  # queries per inner block
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cpos = np.argmax(Vn @ Cn.T, axis=1)  # centroid POSITION per vector
            ids = pdf["id"].to_numpy()
            B = len(ids)
            for q0 in range(0, len(qids), q_chunk):
                q1 = min(q0 + q_chunk, len(qids))
                nq = q1 - q0
                sims = np.round(Qn[q0:q1] @ Vn.T, 6)  # (nq, B)
                qq = np.repeat(qids[q0:q1], B)
                nn = np.tile(ids, nq)
                mask = qq != nn  # drop self-pairs
                yield pd.DataFrame(
                    {
                        "query_id": qq[mask],
                        "neighbor_id": nn[mask],
                        "cos_sim": sims.ravel()[mask],
                        "in_probe": probe_mask[
                            np.repeat(np.arange(q0, q1), B), np.tile(cpos, nq)
                        ][mask],
                    }
                )

    scored = emb.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).mapInPandas(
        _score,
        schema=f"query_id {itype}, neighbor_id {itype}, cos_sim double, in_probe boolean",
    )
    # ONE sort serves both rankings: exact_rank is row_number, ivf_rank is
    # the running count of in_probe rows over the SAME frame spec (so the
    # second ranking adds a window function, not a second shuffle+sort)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    ranked = scored.withColumn("exact_rank", F.row_number().over(w)).withColumn(
        "ivf_rank",
        F.when(
            F.col("in_probe"),
            F.count(F.when(F.col("in_probe"), 1)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ),
    )
    return ranked.groupBy("query_id").agg(
        F.count(
            F.when((F.col("exact_rank") <= k) & (F.col("ivf_rank") <= k), 1)
        ).alias("n_hits")
    )


def blocked_near_dup_pairs(
    emb: DataFrame,
    block_col: str,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate pairs within blocks via per-block matrix
    multiply (applyInPandas).

    The naive formulation self-joins on the block key and ships n^2 vector
    pairs through the shuffle (~200 MB for 200k 64-dim pairs — measured 8s);
    this one ships each block's n vectors once and does one BLAS
    normalized-gram-matrix product per block (~0.5s same data). At larger
    blocks, chunk the gram product inside the worker; the Spark-side
    contract (one group per block key) is unchanged.
    """
    import numpy as np
    import pandas as pd

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = np.round(Vn @ Vn.T, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        sims = S[iu, ju]
        m = sims >= threshold
        a, b = ids[iu[m]], ids[ju[m]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": sims[m]})

    base = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    return base.groupBy("blk").applyInPandas(
        _pairs, schema="id_a long, id_b long, cos_sim double"
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP bucketing (approximate:
    only same-bucket pairs are compared)."""
    planes = srp_planes(dim, n_planes, seed)
    base = emb.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")).withColumn(
        "bucket", srp_bucket(F.col("v"), planes)
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, on="bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    sample_size: int = 2048,
    return_pairs: bool = False,
    return_components: bool = False,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with seeded spherical
    k-means, then keep exactly one representative of every WITHIN-cluster
    cosine-near-duplicate group. Returns (id, centroid_id, keep int).

    Scale shape (the SemDeDup trick): the pair space is restricted to
    k-means cells — cross-cluster near-dups are rare by construction, so
    the quadratic comparison only happens inside cells (one BLAS gram
    product per cell via blocked_near_dup_pairs; at very large cells,
    raise n_clusters — cell size is the knob). Representative choice is
    the minimum id of each pair-graph connected component, consistent
    with the rest of the dedup stack (dedup_keep_canonical), so chains
    of transitively-similar embeddings collapse to one survivor.
    Deterministic end to end for a fixed seed (hash-ordered training
    sample, seeded Lloyd, argmax assignment). With ``return_pairs`` the
    within-cell near-dup pair frame is returned alongside the result
    (``(result, pairs)``) so callers auditing drops don't recompute the
    cell gram products; the pairs frame is then MATERIALIZED too (a lazy
    return would force every auditing caller to re-run the per-cell gram
    products), and the caller owes ``release_materialized(pairs)`` as
    well. The pairs checkpoint is bounded by the near-dup pair count.

    The returned result frame is MATERIALIZED (checkpoint_nostats) — the
    internal connected-components checkpoint is released before
    returning, and the caller holds exactly one releasable checkpoint:
    call ``release_materialized(result)`` when done (same contract as
    ``connected_components``). The checkpoint is three narrow columns
    (id, centroid_id, keep) — the same order of footprint as the CC
    output it replaces.

    ``return_components=True`` (implies pairs) returns ``(result, pairs,
    comps)`` with the internal component frame HANDED TO THE CALLER
    instead of released — three release obligations. Auditors pass comps
    to semantic_dedup_audit so the CC loop runs once, not twice; comps
    never depends on the keep decisions, so reuse costs no
    falsifiability."""
    from snowplow_s3_loader_spark.operators.dedup import (
        checkpoint_nostats,
        release_materialized,
    )
    from snowplow_s3_loader_spark.operators.graph import connected_components

    cents = train_ivf_centroids_sampled(
        emb, n_clusters, vec_col, sample_size=sample_size, seed=seed, id_col=id_col
    )
    assignments, _ = ivf_assign(emb, n_clusters, id_col, vec_col, centroids=cents)
    pairs = blocked_near_dup_pairs(
        assignments, "centroid_id", threshold=threshold, id_col="id", vec_col="v"
    )
    if return_pairs or return_components:
        pairs = checkpoint_nostats(pairs)
    comps = connected_components(pairs)
    losers = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("id"), F.lit(0).alias("keep")
    )
    result = checkpoint_nostats(
        assignments.select("id", "centroid_id")
        .join(losers, "id", "left")
        .select("id", "centroid_id", F.coalesce("keep", F.lit(1)).alias("keep"))
    )
    if return_components:
        return result, pairs, comps
    release_materialized(comps)
    return (result, pairs) if return_pairs else result


def semantic_dedup_audit(
    res: DataFrame,
    pairs: DataFrame,
    comps: DataFrame | None = None,
    materialize: bool = False,
) -> DataFrame:
    """FALSIFIABLE audit of a semantic_dedup result against its pair
    graph: the component structure of ``pairs`` is evaluated
    independently of the keep/drop decisions in ``res`` (id, centroid_id,
    keep) and one row is emitted per vector,

        ok = 1 iff (not in the pair graph and kept) OR (in the pair
             graph and its component has EXACTLY one survivor, which is
             the component-minimum id).

    A wrong survivor choice, a double-keep, a zero-keep component, or a
    dropped isolated vector each flip ok -> 0 for the affected rows —
    this is the engine-side invariant behind q71 (round-5 ADVICE: the
    previous formulation was tautological). Returns (vec_id, ok int),
    unordered.

    ``comps`` may be the component frame semantic_dedup already computed
    (``return_components=True``) — the components never depend on the
    keep decisions, so reusing them costs no falsifiability and skips a
    second CC loop; ownership stays with the caller. When None, CC runs
    here and the frame is this call's checkpoint. ``materialize=True``
    checkpoints the (narrow, two-column) audit output and releases any
    internally-computed comps before returning — the caller then owns
    exactly one checkpoint (the result); otherwise the lazy result reads
    the comps checkpoint and the caller must keep it alive."""
    from snowplow_s3_loader_spark.operators.dedup import (
        checkpoint_nostats,
        release_materialized,
    )
    from snowplow_s3_loader_spark.operators.graph import connected_components

    own_comps = comps is None
    if own_comps:
        comps = connected_components(pairs)
    in_graph = res.join(comps, res.id == comps.node, "inner")
    comp_ok = (
        in_graph.groupBy("component")
        .agg(
            F.sum("keep").alias("n_keep"),
            F.min("id").alias("min_id"),
            F.max(F.when(F.col("keep") == 1, F.col("id"))).alias("kept_id"),
        )
        .select(
            "component",
            ((F.col("n_keep") == 1) & (F.col("kept_id") == F.col("min_id")))
            .cast("int")
            .alias("comp_ok"),
        )
    )
    out = (
        res.join(comps.select(F.col("node").alias("id"), "component"), "id", "left")
        .join(comp_ok, "component", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.when(F.col("component").isNull(), (F.col("keep") == 1).cast("int"))
            .otherwise(F.col("comp_ok"))
            .alias("ok"),
        )
    )
    if materialize:
        out = checkpoint_nostats(out)
        if own_comps:
            release_materialized(comps)
    return out


# ---------------------------------------------------------------------------
# PCA / whitening over embedding columns
# ---------------------------------------------------------------------------


def pca_fit(
    emb: DataFrame, vec_col: str, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean[d], components[k,d], eigenvalues[k]) of the embedding
    column's covariance — the whitening/compression step embedding
    pipelines run before clustering or dedup (SemDeDup et al. operate on
    normalized/whitened vectors).

    One-pass distributed moments: each partition reduces its Arrow
    batches to (n, sum[d], X^T X[d,d]) with BLAS — a single numpy GEMM
    per batch — and ONE row per partition reaches the driver (for d=64
    that is 4 KB/partition, the same bounded-driver-work pattern as the
    IVF training sample). The driver assembles cov = (XtX - n*mean
    mean^T)/(n-1) and eigendecomposes d x d (trivial for embedding-sized
    d; at d where a driver eigh hurts, switch to randomized SVD on the
    same moments). Deterministic: moments are float64 sums whose
    partition split may vary -> tests pin the SUBSPACE, not the signs.
    """
    import pandas as pd

    def _moments(batches):
        n, s, xtx = 0, None, None
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            g = x.T @ x
            xtx = g if xtx is None else xtx + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.reshape(-1).tolist()]}
            )

    parts = emb.select(vec_col).mapInPandas(
        _moments, schema="n long, s array<double>, xtx array<double>"
    ).collect()
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    xtx = np.sum([np.array(r["xtx"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / max(1, n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    return mean, evecs[:, order].T.copy(), evals[order]


def pca_project(
    emb: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    eigenvalues: np.ndarray | None = None,
    out_col: str = "pca",
) -> DataFrame:
    """Project (and optionally whiten, when eigenvalues are given) the
    embedding column onto the fitted components: one numpy GEMM per
    Arrow batch against the broadcast [k,d] matrix — zero shuffle, the
    same vectorized shape as ivf_assign."""
    import pandas as pd

    sc = emb.sparkSession.sparkContext
    b_mean = sc.broadcast(np.asarray(mean, dtype=np.float64))
    b_comp = sc.broadcast(np.asarray(components, dtype=np.float64))
    b_scale = sc.broadcast(
        None if eigenvalues is None else 1.0 / np.sqrt(np.maximum(eigenvalues, 1e-12))
    )

    out_fields = emb.schema.fieldNames() + [out_col]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in emb.schema.fields]
        + [f"{out_col} array<double>"]
    )

    def _proj(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = (x - b_mean.value) @ b_comp.value.T
            if b_scale.value is not None:
                y = y * b_scale.value
            pdf = pdf.copy()
            pdf[out_col] = list(y)
            yield pdf[out_fields]

    return emb.mapInPandas(_proj, schema=schema)


def pca_save(path: str, mean: np.ndarray, components: np.ndarray,
             eigenvalues: np.ndarray) -> None:
    """Persist a fitted PCA model (driver-side npz artifact — model files
    are small and live beside the data; the bloom/IVF artifacts are
    DataFrames and persist as parquet directly)."""
    np.savez(path, mean=mean, components=components, eigenvalues=eigenvalues)


def pca_load(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    d = np.load(path if path.endswith(".npz") else path + ".npz")
    return d["mean"], d["components"], d["eigenvalues"]


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory/shuffle-footprint lever for
# embedding pipelines at scale: uint8 codes are 4x smaller than float32
# (16x smaller than the float64 math), so a quantized corpus moves 4x
# fewer bytes through every ANN shuffle and fits 4x more vectors per
# executor. Bounds are global per-dimension min/max (the standard
# symmetric-free scalar quantizer); codes are EXACT integer outputs of
# IEEE double arithmetic, so they hash-match the DuckDB oracle
# bit-for-bit (unlike the float cosine path, which needs tolerances).
# ---------------------------------------------------------------------------


def quantization_bounds(
    emb: DataFrame, vec_col: str
) -> tuple[list[float], list[float]]:
    """Per-dimension global (min, max) of the embedding column. Each
    partition reduces to ONE (mins[d], maxs[d]) row via numpy
    (the pca_fit bounded-driver-work pattern — 32 rows x 1 KB reach the
    driver, zero shuffle); min/max are order-independent, so the result
    is exact regardless of the partition split."""
    import pandas as pd

    def _bounds(batches):
        mn = mx = None
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy())
            lo, hi = x.min(0), x.max(0)
            mn = lo if mn is None else np.minimum(mn, lo)
            mx = hi if mx is None else np.maximum(mx, hi)
        if mn is not None:
            yield pd.DataFrame({"mn": [mn.tolist()], "mx": [mx.tolist()]})

    parts = emb.select(vec_col).mapInPandas(
        _bounds, schema="mn array<double>, mx array<double>"
    ).collect()
    if not parts:
        raise ValueError("quantization_bounds: empty input")
    mn = np.min([np.array(r["mn"]) for r in parts], axis=0)
    mx = np.max([np.array(r["mx"]) for r in parts], axis=0)
    return mn.tolist(), mx.tolist()


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str,
    mins: list[float],
    maxs: list[float],
    out_col: str = "codes",
) -> DataFrame:
    """Add ``out_col``: the uint8-range codes
    ``least(255, floor((v - min_d) * 255 / (max_d - min_d)))`` per
    dimension (0 where the dimension is constant). Pure JVM expressions
    over broadcast literal bound arrays — per-row, zero shuffle, and
    engine-portable: floor of IEEE double math is deterministic, so the
    same SQL reproduces the codes exactly. Dequantization for rescoring
    is the affine inverse ``min_d + (code + 0.5) * range_d / 255``.

    Values OUTSIDE the supplied bounds saturate on both ends (0 / 255):
    the API accepts arbitrary mins/maxs (e.g. bounds fit on an earlier
    corpus snapshot), so a value below ``min_d`` must clamp to 0, not
    produce a negative code outside the promised uint8 range."""
    if len(mins) != len(maxs):
        raise ValueError("mins and maxs must have the same length")
    mins_lit = F.array(*[F.lit(float(v)) for v in mins])
    maxs_lit = F.array(*[F.lit(float(v)) for v in maxs])

    def _code(x, i):
        mn = F.element_at(mins_lit, i + 1)
        rng = F.element_at(maxs_lit, i + 1) - mn
        q = F.floor(((x.cast("double") - mn) * F.lit(255.0)) / rng).cast("int")
        return F.when(
            rng > 0, F.greatest(F.lit(0), F.least(F.lit(255), q))
        ).otherwise(F.lit(0))

    return emb.withColumn(out_col, F.transform(F.col(vec_col), _code))


# ---------------------------------------------------------------------------
# product quantization (round 7) — Jegou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011. Extends the int8 scalar quantizer:
# the vector splits into m subvectors, each encoded as the id of its
# nearest per-subspace centroid, so an m*log2(k)-bit code replaces d
# floats (m=4, k=16 on 64-dim floats = 64x smaller through downstream
# shuffles) and query scoring becomes m table lookups per vector (ADC).
# ---------------------------------------------------------------------------


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 7,
    max_iter: int = 12,
) -> list:
    """Train PQ codebooks: per-subspace euclidean k-means over the same
    bounded md5-ordered driver sample as the IVF trainer (~1 MB; codebook
    quality converges on a few thousand points). Vectors are
    L2-normalized first (the engine's similarity is cosine, so encoding
    happens on the unit sphere and ADC scores are dot products).
    Returns ``codebooks``: m lists of k centroid lists (python floats —
    plain data, broadcastable, json/npz-serializable)."""
    rows = (
        emb.select(
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            as_double(F.col(vec_col)).alias("v"),
        )
        .orderBy("_h")
        .limit(sample_size)
        .select("v")
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    if X.shape[1] % m:
        raise ValueError(f"dim {X.shape[1]} not divisible by m={m}")
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    sub = X.shape[1] // m
    books = []
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        C = Xj[rng.choice(len(Xj), size=min(k, len(Xj)), replace=False)].copy()
        for _ in range(max_iter):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            moved = False
            for c in range(len(C)):
                members = Xj[assign == c]
                if len(members):
                    nc = members.mean(axis=0)
                    if not np.allclose(nc, C[c]):
                        moved = True
                    C[c] = nc
            if not moved:
                break
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """(id, pq_codes): per-subspace nearest-centroid ids (array<int>,
    length m). One numpy distance computation per Arrow batch per
    subspace against the broadcast codebooks — zero shuffle, the
    ivf_assign execution shape. Vectors are L2-normalized before
    encoding (matching pq_train)."""
    import pandas as pd

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    # the id passes through untouched — carry its actual type instead of
    # hardcoding long (string/int32 ids would hit an Arrow schema
    # mismatch; round-7 review finding)
    id_type = emb.schema[id_col].dataType.simpleString()
    spark_schema = f"id {id_type}, pq_codes array<int>"

    def _enc(it):
        for pdf in it:
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            if len(X):
                X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                codes = np.empty((len(X), len(books)), dtype=np.int32)
                for j, C in enumerate(books):
                    Xj = X[:, j * sub : (j + 1) * sub]
                    # ||x-c||^2 = ||x||^2 - 2xc + ||c||^2; argmin drops ||x||^2
                    d = -2.0 * (Xj @ C.T) + (C * C).sum(axis=1)[None, :]
                    codes[:, j] = np.argmin(d, axis=1)
                yield pd.DataFrame({"id": pdf["id"], "pq_codes": list(codes.tolist())})
            else:
                yield pd.DataFrame({"id": pdf["id"], "pq_codes": []})

    base = emb.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    return base.mapInPandas(_enc, spark_schema).withColumnRenamed("pq_codes", out_col)


def pq_topk_adc(
    emb: DataFrame,
    codes: DataFrame,
    codebooks: list,
    query_pred: Column,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> DataFrame:
    """Asymmetric-distance top-k: queries (rows of ``emb`` matching
    ``query_pred``) score every PQ code with m table lookups — the
    per-query lookup tables (m x k dot products with the codebooks) are
    tiny and broadcast with the queries; the corpus side streams its
    CODES (m bytes-ish per row, never the float vectors), takes an ADC
    shortlist per query, and only the shortlist (|q| x shortlist rows)
    joins back to real vectors for exact cosine re-ranking — the
    standard PQ serving pipeline. Returns (query_id, neighbor_id, sim,
    rank) like the other ANN operators. Requires an integral id column
    (query ids ride a driver-built frame; validated up front).

    The query set RIDES THE DRIVER (full float vectors collected to
    build the broadcast lookup tables), so ``query_pred`` must select a
    BOUNDED set — fraction-style predicates (``vec_id % 100 == 0``)
    grow linearly with the corpus and would eventually exhaust driver
    memory. ``max_queries`` (default 10k ≈ 10k x dim x 8 B collected,
    plus a |q| x m x k lookup tensor broadcast per executor) enforces
    that contract up front with a loud ValueError instead of an OOM.

    Scale shape: one corpus scan over codes + one |q|*shortlist-sized
    exact re-rank join; the corpus float vectors never shuffle."""
    import pandas as pd

    id_type = emb.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint", "long"):
        raise ValueError(
            f"pq_topk_adc requires an integral id column, got {id_col}: {id_type}"
        )
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    qrows = (
        emb.where(query_pred)
        .select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .limit(max_queries + 1)
        .collect()
    )
    if not qrows:
        raise ValueError("query_pred matched no rows")
    if len(qrows) > max_queries:
        raise ValueError(
            f"query_pred matched more than max_queries={max_queries} rows; "
            "pq_topk_adc queries ride the driver and broadcast — select a "
            "bounded query set or raise max_queries deliberately"
        )
    qids = [r["qid"] for r in qrows]
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # lookup tables: tables[q][j][c] = q_j . c_{j,c}
    tables = np.stack(
        [Q[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(len(books))],
        axis=1,
    )  # (|q|, m, k)

    def _adc(it):
        for pdf in it:
            C = np.array(pdf["pq_codes"].tolist(), dtype=np.int64)  # (n, m)
            if not len(C):
                continue
            # scores[q, n] = sum_j tables[q, j, C[n, j]]
            scores = np.zeros((len(tables), len(C)))
            for j in range(C.shape[1]):
                scores += tables[:, j, :][:, C[:, j]]
            top = min(len(C), shortlist)
            idx = np.argpartition(-scores, top - 1, axis=1)[:, :top]
            out_q, out_n, out_s = [], [], []
            ids = pdf["id"].to_numpy()
            for qi in range(len(tables)):
                out_q.extend([qids[qi]] * top)
                out_n.extend(ids[idx[qi]].tolist())
                out_s.extend(scores[qi, idx[qi]].tolist())
            yield pd.DataFrame({"query_id": out_q, "cand_id": out_n, "adc": out_s})

    # per-partition shortlists union to <= partitions * |q| * shortlist rows;
    # the global per-query shortlist re-trims during the exact re-rank
    cand = codes.select("id", "pq_codes").mapInPandas(
        _adc, "query_id long, cand_id long, adc double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "cand_id")
    cand = cand.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= shortlist
    )
    corpus = emb.select(
        F.col(id_col).alias("cand_id"), as_double(F.col(vec_col)).alias("cv")
    )
    qdf = emb.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, Q)],
        "query_id long, qv array<double>",
    )
    reranked = (
        cand.select("query_id", "cand_id")
        .join(corpus, "cand_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
        .where(F.col("cand_id") != F.col("query_id"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), "cand_id")
    return (
        reranked.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("neighbor_id"), "sim", "rank")
    )


def kmv_signatures(
    items: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group bottom-k MinHash (KMV) signature over an item column —
    the bounded sketch behind the source-overlap matrix: hash every
    item with the portable 60-bit md5 prefix, keep each group's k
    SMALLEST DISTINCT hash values. (Beyond the reference's surface —
    Beyer et al. 2007 K-Minimum Values; the single-set KMV distinct
    sketch is q136, this is its multi-set set-ALGEBRA use.)

    Scale shape: one distinct (group, hash) aggregation over the item
    stream, then a GROUP-KEYED rank window (partitioned — the groups
    axis is the parallelism) capped at k — output is <= |groups| * k
    rows, bounded by the SKETCH, not the data.

    Output: (group_col, h, rk) with rk the 1-based rank of h within
    the group (ascending)."""
    if k < 1:
        raise ValueError(f"kmv_signatures: k must be >= 1, got {k}")
    hashed = (
        items.select(
            F.col(group_col).alias("__g"),
            F.conv(F.substring(F.md5(F.col(item_col)), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .groupBy("__g", "h")
        .agg(F.lit(1).alias("__one"))
    )
    w = Window.partitionBy("__g").orderBy("h")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("__g").alias(group_col), "h", "rk")
    )


def kmv_overlap_matrix(
    sigs: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard ESTIMATES between groups from their KMV
    signatures — the corpus-mixture diagnostic ("how much does source
    A duplicate source B?") at sketch cost: for each unordered pair,
    take the k smallest distinct hashes of the UNION of the two
    signatures (computable from the signatures alone — the KMV merge
    property) and count how many lie in BOTH:

        jaccard_micro = n_both * 1e6 div k_u     (truncating, exact)

    with k_u = min(k, |union|) the union sketch's actual size. The
    estimate is the standard KMV set-similarity estimator (unbiased,
    s.e. ~ 1/sqrt(k)).

    Scale shape: everything runs on the <= |groups|*k-row signature
    frame — the pair expansion is |groups|^2 * k rows (bounded by the
    sketch; guard your group cardinality upstream), never the corpus.
    Exactness: hashes are the portable md5 prefix; counts and the
    truncating division replay identically in any engine.

    Output: (group_a, group_b, k_used, n_both, jaccard_micro) for
    group_a < group_b."""
    g = F.col(group_col)
    a = sigs.select(g.alias("ga"), F.col("h"))
    b = sigs.select(g.alias("gb"), F.col("h").alias("hb"))
    pairs = (
        a.select("ga")
        .distinct()
        .join(b.select("gb").distinct())
        .where(F.col("ga") < F.col("gb"))
    )
    # pair x union-of-hashes, with membership flags per side
    u = (
        pairs.join(
            sigs.select(g.alias("__g"), "h"),
            (F.col("__g") == F.col("ga")) | (F.col("__g") == F.col("gb")),
        )
        .groupBy("ga", "gb", "h")
        .agg(
            F.max((F.col("__g") == F.col("ga")).cast("int")).alias("in_a"),
            F.max((F.col("__g") == F.col("gb")).cast("int")).alias("in_b"),
        )
    )
    wu = Window.partitionBy("ga", "gb").orderBy("h")
    topu = u.withColumn("__rk", F.row_number().over(wu)).where(
        F.col("__rk") <= k
    )
    return topu.groupBy("ga", "gb").agg(
        F.count("*").cast("long").alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        F.expr(
            "CAST(sum(in_a * in_b) AS BIGINT) * 1000000 div count(*)"
        ).alias("jaccard_micro"),
    )


def truncation_recall(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    dims_keep: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-truncation quality audit — the measurement behind the
    "can we search on the first d' dimensions?" decision (Matryoshka-
    style truncation, Kusupati et al. 2022; also the first question any
    PQ/IVF cost cut asks): for each query vector, the exact cosine
    top-k under the FULL vector vs under its first ``dims_keep``
    components, reported as the per-query overlap

        recall_micro = |topk_full ∩ topk_trunc| * 1e6 div k

    Both sides ride `brute_force_topk`'s deterministic ranking
    contract (round(cos, 6) DESC, neighbor_id ASC), so the overlap is
    engine-exact — approximation error comes ONLY from the truncation
    under audit, never from the measurement.

    Scale shape: two broadcast-join scoring passes over the corpus
    (queries are the small side) + one query-keyed count of the rank-k
    join; at 100 TB the same audit runs on a sampled query set (the
    query_pred contract) — the corpus passes are the cost and they are
    embarrassingly parallel.

    Output: (query_id, n_full, n_trunc, n_common, recall_micro)
    ordered by query_id."""
    if dims_keep < 1:
        raise ValueError(
            f"truncation_recall: dims_keep must be >= 1, got {dims_keep}"
        )
    full = brute_force_topk(
        emb, query_pred, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    sliced = emb.select(
        F.col(id_col),
        F.slice(F.col(vec_col), 1, dims_keep).alias("__tv"),
        query_pred.alias("__is_q"),
    )
    trunc = brute_force_topk(
        sliced, F.col("__is_q"), k=k, id_col=id_col, vec_col="__tv"
    ).select(
        F.col("query_id"), F.col("neighbor_id").alias("t_neighbor")
    )
    common = (
        full.join(
            trunc,
            (full["query_id"] == trunc["query_id"])
            & (full["neighbor_id"] == trunc["t_neighbor"]),
        )
        .groupBy(full["query_id"].alias("query_id"))
        .agg(F.count("*").alias("n_common"))
    )
    # per-query stats hang off the QUERY-ID SPINE (every row matching
    # query_pred), not off the neighbor frames: a query with zero scored
    # neighbors (degenerate corpus of one vector) must still emit a zero
    # row, exactly as the oracle's `FROM q LEFT JOIN common` does
    spine = emb.where(query_pred).select(F.col(id_col).alias("query_id"))
    per_q = (
        spine.join(
            full.groupBy("query_id").agg(F.count("*").alias("n_full")),
            "query_id",
            "left",
        )
        .join(
            trunc.groupBy("query_id").agg(F.count("*").alias("n_trunc")),
            "query_id",
            "left",
        )
        .join(common, "query_id", "left")
    )
    return per_q.select(
        "query_id",
        F.coalesce("n_full", F.lit(0)).cast("long").alias("n_full"),
        F.coalesce("n_trunc", F.lit(0)).cast("long").alias("n_trunc"),
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        F.expr(f"(coalesce(n_common, 0) * 1000000) div {k}").alias(
            "recall_micro"
        ),
    ).orderBy("query_id")
