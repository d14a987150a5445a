"""Loaders for the synthetic test tables (/root/testdata/sf*/ — TESTDATA.md).

Normalization notes:
  - events.ts is written as parquet INT64 TIMESTAMP(NANOS,false); Spark reads
    it only with spark.sql.legacy.parquet.nanosAsLong=true, yielding a long of
    nanoseconds. We truncate ns -> us and cast to TIMESTAMP_NTZ, which is
    exactly what DuckDB reports for the same column (naive micros), so
    oracle hash-matching stays stable.
  - all other timestamp columns arrive as TIMESTAMP_NTZ already (parquet
    micros, isAdjustedToUTC=false).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# tables whose derived queries do heavy per-row compute (JSON parse, regex,
# tokenization, n-gram hashing, line synthesis) before any shuffle.
# documents joined events here in round 13: every text operator
# (tokenize + md5 n-gram passes) was riding the raw single-row-group
# scan, i.e. ONE task — the dsir feature pass alone measured 3.9 s
# single-threaded vs 0.6 s spread (guide §2.5 "input skew": one huge
# unsplittable input split).
_CPU_DENSE_TABLES = {"events", "documents"}

# per-session DataFrame cache: repeated queries against the same (sf_dir,
# table) reuse one logical plan, and the events repartition+persist is paid
# once per session instead of once per query. Keyed by applicationId (stable
# per SparkSession, never reused across sessions — unlike id(spark), which
# CPython can recycle after GC); entries from older applications are evicted
# so persisted frames don't outlive their session. Bounded: eviction (stale
# app, LRU overflow, clear_table_cache) UNPERSISTS the frame, so a session
# cycling many sf_dirs cannot accumulate cached blocks.
_df_cache: dict[tuple[str, str, str], DataFrame] = {}

# persisted entries a long-lived session may hold at once; small because only
# CPU-dense tables persist and each is one sf_dir's events frame
_CACHE_MAX_ENTRIES = 32


def _evict(key: tuple[str, str, str]) -> None:
    df = _df_cache.pop(key, None)
    if df is not None:
        try:
            if df.storageLevel.useMemory or df.storageLevel.useDisk:
                df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped: nothing to release


def clear_table_cache() -> None:
    """Drop every cached table frame and unpersist any cached blocks.
    Bench isolation and tests call this between runs."""
    for key in list(_df_cache):
        _evict(key)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = True
) -> DataFrame:
    """Read one synthetic table, normalizing driver-specific physical types.

    Parallelism floor: the driver-generated files are single-row-group
    parquet, so a raw scan is ONE task and every narrow stage after it runs
    single-threaded. When the scan has fewer splits than the cluster's
    default parallelism, repartition up to it — a cheap local shuffle here,
    and a no-op condition on a real multi-file 100 TB layout (splits >>
    cores). Filters/pruning still push to the scan through the exchange."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir.rstrip("/"), name) if parallelize else None
    if key is not None and key in _df_cache:
        return _df_cache[key]
    for stale in [k for k in _df_cache if k[0] != app_id]:
        _evict(stale)
    while len(_df_cache) >= _CACHE_MAX_ENTRIES:
        _evict(next(iter(_df_cache)))  # FIFO: oldest insertion goes first
    # Runtime conf injection point: queries receive the DRIVER's session
    # (no engine conf), so everything runtime-settable is applied here —
    # incl. the ns->NTZ path (cast goes through TIMESTAMP_LTZ; session tz
    # must be UTC for the wall-clock to equal the stored naive value).
    from snowplow_s3_loader_spark.session import tune_session

    tune_session(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: ns-since-epoch exceeds 2^53, double math
        # would be off by ±1us
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    # CPU-dense sources only: the shuffle is cheaper than single-threaded
    # JSON/regex/tokenize parsing, but pure overhead for light scans/aggs
    # where the first real shuffle already spreads the work. Scale guard
    # (round 13): only when the scan has fewer splits than the cluster —
    # on a real many-file 100 TB layout (splits >> cores) repartitioning
    # DOWN to core count and persisting the corpus would both be wrong,
    # so the whole branch is a no-op there.
    if parallelize and name in _CPU_DENSE_TABLES:
        par = spark.sparkContext.defaultParallelism
        n_splits = len(df.inputFiles())
        if n_splits and n_splits < par:
            df = df.repartition(par)
            if name == "documents":
                # DISK_ONLY (round 13): the corpus cache exists to pay
                # the parallelism-floor shuffle once per session, not to
                # occupy driver/executor heap — a 185-query marathon
                # session at the 1-g default heap OOM'd in the scale
                # battery with the text corpus held as a deserialized
                # in-memory cache on top of everything else. Local disk
                # reads of the small repartitioned corpus are noise;
                # events keeps the default level it has had since its
                # introduction.
                from pyspark import StorageLevel

                df = df.persist(StorageLevel.DISK_ONLY)
            else:
                df = df.persist()
    if key is not None:
        _df_cache[key] = df
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every synthetic table as a temp view; returns the frames."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
