"""Parquet scan layer (reference surface: ``dd.read_parquet(path, columns=...,
filters=...)`` — SURVEY.md §2.1).

In Spark the ``columns=`` / ``filters=`` knobs are unnecessary: Catalyst
pushes projections and predicates into the scan automatically (verify with
``plans.pushed_filters``). What this module adds:

- one canonical loader for the driver fixtures,
- the **nano-timestamp workaround**: the fixture ``events.parquet`` stores
  ``ts`` as INT64 TIMESTAMP(NANOS,false), which Spark's vectorized reader
  rejects outright. With ``spark.sql.legacy.parquet.nanosAsLong=true`` the
  column arrives as LongType nanoseconds; we convert with *integer* division
  (``div 1000`` — double math would lose precision above 2^53) to micros and
  cast to TIMESTAMP_NTZ under a UTC session so values equal DuckDB's naive
  reading of the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

FIXTURE_TABLES = (
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

# Columns written as TIMESTAMP(NANOS) in the fixtures → read as long nanos.
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Resolved-scan cache (the engine's "catalog"): spark.read.parquet re-lists
# files and re-reads footers on every call, which costs ~100-1000× the
# execution time of a warm small-SF query. Memoizing the resolved DataFrame
# reuses the file index + schema exactly like a real catalog's table entry;
# no DATA is cached (plans stay lazy), so this is safe at any scale. Bounded
# LRU: 64 entries ≈ several SF dirs × 10 tables; a service cycling through
# many dirs evicts oldest instead of leaking.
from ..cache import BoundedCache

_TABLE_CACHE: BoundedCache[tuple[str, str, str], DataFrame] = BoundedCache(capacity=64)


def _nanos_to_ts_ntz(df: DataFrame, col: str) -> DataFrame:
    # integer `div` keeps full precision for epoch-nanos (~1.7e18 > 2^53)
    return df.withColumn(
        col, F.expr(f"cast(timestamp_micros(`{col}` div 1000) as timestamp_ntz)")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    Schema comes from the Parquet footer (trusted); nano-timestamp columns
    are normalized to TIMESTAMP_NTZ so all engines agree on wall-clock values.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = _nanos_to_ts_ntz(df, col)
    _TABLE_CACHE.put(key, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several fixture tables at once: ``t = load_tables(spark, d, "orders", ...)``."""
    return {n: load_table(spark, sf_dir, n) for n in (names or FIXTURE_TABLES)}


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Spread a narrow-but-CPU-heavy pipeline across at least ``n``
    partitions (default: the cluster's defaultParallelism).

    Why it exists: parquet byte-range splitting is bounded by ROW-GROUP
    granularity, so a small single-row-group file scans as ONE task no
    matter what `spark.sql.files.minPartitionNum` asks for — and an
    expression-heavy narrow map (n-gram shingling, per-token scoring) then
    runs single-threaded (measured 7.3 s -> 0.6 s on decontam_check at
    sf0.1). At real corpus scale the scan already has >= n partitions and
    this is a NO-OP — the repartition only ever moves a toy-sized input, so
    the helper is safe to leave in the operator path.

    ADVICE r18 #1: the ``df.rdd.getNumPartitions()`` probe forces physical
    planning, so the decision is memoized per (session, semantic plan, n) —
    an operator called repeatedly on the same input (fuzzy ``_prep``, both
    sides of a lookup build) pays the probe once. ``semanticHash`` needs
    only the analyzed plan (one cheap py4j call); a hash collision could at
    worst mis-spread a different plan — a perf wobble, never a correctness
    one, same blast radius as the table-keyed cache below."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    key = (df.sparkSession.sparkContext.applicationId, df.semanticHash(), n)
    needs = _SPREAD_CACHE.get(key)
    if needs is None:
        needs = df.rdd.getNumPartitions() < n
        _SPREAD_CACHE.put(key, needs)
    return df.repartition(n) if needs else df


# Memoized spread decisions: probing a scan's partition count costs a
# Python→JVM physical-plan materialization (~10s of ms), and the answer is a
# pure function of (session, plan, target width) — so pay it once per plan,
# not once per operator call. Two key shapes share the cache (they can never
# collide — different tuple arity): (appId, sf_dir, table, n) from
# load_table_spread and (appId, semanticHash, n) from ensure_min_partitions.
_SPREAD_CACHE: BoundedCache[tuple, bool] = BoundedCache(capacity=128)


def load_table_spread(
    spark: SparkSession, sf_dir: str, name: str, n: int | None = None
) -> DataFrame:
    """``load_table`` + ``ensure_min_partitions`` with the repartition
    decision cached per (session, sf_dir, table, n). Narrow transforms
    (select/filter/explode) applied after the returned scan keep the spread,
    so expression-heavy pipelines use all cores even on single-row-group
    fixture files; at real scale the decision is computed once, found to be
    a no-op, and never probed again."""
    if n is None:
        n = spark.sparkContext.defaultParallelism
    df = load_table(spark, sf_dir, name)
    key = (spark.sparkContext.applicationId, sf_dir, name, n)
    needs = _SPREAD_CACHE.get(key)
    if needs is None:
        needs = df.rdd.getNumPartitions() < n
        _SPREAD_CACHE.put(key, needs)
    return df.repartition(n) if needs else df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every fixture table as a temp view (``prefix + name``) so
    the whole corpus is drivable from plain ``spark.sql`` — the same
    registration surface the DuckDB oracle gets, and the lowest-friction
    path for a SQL-first user switching from the reference: after one call,
    ``spark.sql("SELECT ... FROM documents JOIN embeddings ...")`` works
    with all the load-path normalizations (nano-timestamp handling) already
    applied. Returns the registered view names."""
    names = []
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
        names.append(prefix + name)
    return names
