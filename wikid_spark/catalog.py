"""Table catalog over the driver's parquet test data.

One place to resolve table names → DataFrames so every query reads
through the same path (and so a future cluster deployment can swap the
``sf_dir`` convention for a metastore without touching query code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

# Cross-table contract: ``embeddings.vec_id`` IS a ``documents.doc_id``
# — each embeddings row is the vector of that document, and embeddings
# ⊆ documents (a corpus may be partially embedded, never the reverse).
# Queries joining the two on doc_id == vec_id (pp_semantic_dedup_gate,
# pp_dedup_funnel_report) rely on this; tools/gen_sf.py preserves it by
# shifting vec_id with the DOCUMENTS stride per copy, and
# tests/test_catalog.py pins it at the driver SFs and on scaled output.


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Lazy — the scan only materializes columns/rows the
    downstream plan needs (Catalyst prunes + pushes down into parquet).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's
    reader rejects by default; we read it as raw int64 nanoseconds
    (legacy nanosAsLong) and convert with integer arithmetic to a
    microsecond timestamp — matching DuckDB's micro truncation exactly
    (no double round-trip, no precision loss at 1e18 magnitudes).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Timestamp semantics must match the DuckDB oracle (naive UTC)
    # regardless of the CALLER's session defaults — the driver runs
    # queries with its own SparkSession, not session.get_spark().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in _COMPUTE_DENSE_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        target = spark.sparkContext.defaultParallelism
        if _est_scan_splits(sf_dir, name) < target:
            # see spread_for_compute: unlock every core for the
            # CPU-dense kernels these tables feed; no-op at any scale
            # where the scan itself parallelizes. Filters still push
            # down — Catalyst moves predicates below Repartition.
            df = df.repartition(target)
        return df
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # Dispatch on what the reader produced: the driver's files are
        # TIMESTAMP(NANOS) → raw int64 under nanosAsLong, converted with
        # integer arithmetic; scaled-up datasets (tools/gen_sf.py) carry
        # micros → TIMESTAMP_NTZ, which under the UTC session tz casts
        # to the identical wall-clock timestamp.
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Tables whose consumers are compute-bound (per-row text kernels,
# shingle/minhash signing, vector math) rather than IO-bound — the
# catalog spreads their scans when the file layout under-parallelizes
# (see spread_for_compute's rationale; measured 8-11x at sf1 in
# SCALE.md round 13). Star-schema tables stay scan-shaped: their
# consumers are joins/aggs where the shuffle provides parallelism.
_COMPUTE_DENSE_TABLES = frozenset({"documents", "embeddings"})

_SPLIT_EST_CACHE: dict = {}


def _est_scan_splits(sf_dir: str, name: str) -> int:
    """Estimate how many splits a parquet scan of this table plans,
    from file stats alone (no Spark planning): one split per
    maxPartitionBytes-sized chunk per file, at least one per file.
    Cached on the table's content signature. The estimate errs small
    for many-tiny-file layouts (Spark packs them), which only makes
    the spread fire more readily — the conservative direction."""
    sig = _table_sig(sf_dir, name)
    got = _SPLIT_EST_CACHE.get(sig)
    if got is None:
        max_bytes = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default
        got = sum(max(1, -(-size // max_bytes)) for _, size, _ in sig[1])
        _SPLIT_EST_CACHE[sig] = got
    return got


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition a DataFrame whose PLANNED parallelism is
    below the session's core count, so the CPU-dense kernel downstream
    (minhash signing, shingle explode, vector math) runs on every core.

    Why: a small table scans as ONE parquet split regardless of cluster
    size — fine for IO-bound plans, serializing for compute-bound ones
    (the round-13 profile found the full corpus minhash pass pinned to
    a single task at bench scale, 31 cores idle). At 100 TB any real
    table plans thousands of splits, the condition fails, and this is a
    NO-OP — no shuffle is ever added where the scan already
    parallelizes. Where it does fire, the exchange moves less data than
    one core's worth of downstream kernel work.

    Call it AFTER source filters so parquet predicate pushdown stays
    below the exchange, and only ahead of genuinely compute-bound
    kernels — an IO-shaped filter/project never needs it."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


_ROWCOUNT_CACHE: dict = {}


def _table_sig(sf_dir: str, name: str):
    """(path, [(file, size, mtime_ns), ...]) content signature of one
    table — the same identity corpus_rows memoizes on. Cheap: a stat
    walk, no file reads."""
    import os

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    return path, tuple(
        (f, os.path.getsize(f), os.stat(f).st_mtime_ns) for f in files
    )


def corpus_fingerprint(sf_dir: str, name: str) -> str:
    """Short stable digest of a table's (files, sizes, mtimes)
    signature. Cache keys that must invalidate when the table's CONTENT
    changes — not just its rowcount — fold this in (ADVICE r11: a
    regenerated corpus with the same rowcount must not serve a stale
    persisted ANN index)."""
    import hashlib

    path, sig = _table_sig(sf_dir, name)
    return hashlib.md5(repr((path, sig)).encode()).hexdigest()[:16]


def corpus_rows(sf_dir: str, name: str) -> int:
    """Exact row count of one table from parquet FOOTER metadata — no
    Spark job, no data scan. derived_k-style index sizing needs only
    the unfiltered table cardinality, which parquet already stores per
    row group; reading footers costs O(#files), not O(bytes), so at
    100 TB this is a driver-side metadata enumeration where a
    DataFrame.count() is a full cluster pass (ADVICE round 8: each
    derived-K query paid an extra corpus scan per invocation, the
    composites two). Memoized per (file, size, mtime) so repeated
    queries in one session don't even re-read footers. Falls back to
    a Spark-free pyarrow dataset walk for directory-shaped tables."""
    import pyarrow.parquet as pq

    path, sig = _table_sig(sf_dir, name)
    files = [f for f, _, _ in sig]
    cached = _ROWCOUNT_CACHE.get(path)
    if cached is not None and cached[0] == sig:
        return cached[1]
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    _ROWCOUNT_CACHE[path] = (sig, n)
    return n
