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
        if _est_scan_splits(sf_dir, name, *_session_split_conf(spark)) < target:
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

_SIZE_UNITS = {
    "": 1, "b": 1,
    "k": 1024, "kb": 1024,
    "m": 1024**2, "mb": 1024**2,
    "g": 1024**3, "gb": 1024**3,
    "t": 1024**4, "tb": 1024**4,
    "p": 1024**5, "pb": 1024**5,
}


def _size_bytes(value, default: int) -> int:
    """Parse a Spark byte-string conf value ('128MB', '134217728b',
    '1g', a bare int) to bytes — the same suffix grammar Spark's
    JavaUtils.byteStringAsBytes accepts, minus negative values."""
    import re as _re

    if value is None:
        return default
    m = _re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", str(value))
    if not m or m.group(2).lower() not in _SIZE_UNITS:
        return default
    return int(m.group(1)) * _SIZE_UNITS[m.group(2).lower()]


def _session_split_conf(spark: SparkSession) -> tuple[int, int | None]:
    """(maxPartitionBytes, explicit minPartitionNum or None) from the
    SESSION conf, so the split estimate tracks what this session's
    planner will actually do instead of assuming the 128 MB default
    (ADVICE r13: a session that overrides either conf made the spread
    decision diverge from Spark's real plan)."""
    max_bytes = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", None),
        128 * 1024 * 1024,
    )
    raw_min = spark.conf.get("spark.sql.files.minPartitionNum", None)
    try:
        min_parts = int(raw_min) if raw_min else None
    except ValueError:
        min_parts = None
    return max_bytes, min_parts


def _est_scan_splits(
    sf_dir: str,
    name: str,
    max_bytes: int = 128 * 1024 * 1024,
    min_partitions: int | None = None,
) -> int:
    """Estimate how many splits a parquet scan of this table plans,
    from file stats alone (no Spark planning): one split per
    split-size chunk per file, at least one per file. Cached on the
    table's content signature + the conf knobs. The estimate errs
    small for many-tiny-file layouts (Spark packs them), which only
    makes the spread fire more readily — the conservative direction.

    ``min_partitions`` models an EXPLICIT spark.sql.files.
    minPartitionNum: Spark then shrinks the split size to
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/min)) so
    the scan plans at least that many splits. We deliberately do NOT
    model the implicit default (leaf parallelism shrinks splits too):
    planned-split count overstates REAL parallelism when row groups
    are coarse — a 500 MB single-row-group file "plans" 32 splits but
    31 produce zero rows — and the conservative flat-maxPartitionBytes
    estimate is what the measured 8-11x sf1 wins validated."""
    sig = _table_sig(sf_dir, name)
    key = (sig, max_bytes, min_partitions)
    got = _SPLIT_EST_CACHE.get(key)
    if got is None:
        split = max_bytes
        if min_partitions:
            open_cost = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes
            total = sum(size + open_cost for _, size, _ in sig[1])
            split = min(max_bytes, max(open_cost, -(-total // min_partitions)))
        got = sum(max(1, -(-size // split)) for _, size, _ in sig[1])
        _SPLIT_EST_CACHE[key] = got
    return got


# Logical-plan node names whose presence means the plan ALREADY
# redistributes (or was already spread): repartition/aggregate/window
# output lands on spark.sql.shuffle.partitions-many (or target-many)
# partitions, so a further round-robin spread would be a pure-waste
# second exchange. Compared against each tree node's nodeName — NOT a
# substring probe of the rendered plan, where a string literal or
# alias containing "Window..." would silently suppress a needed
# spread (ADVICE r14). Prefix match so "Repartition" also catches
# RepartitionByExpression/RepartitionOperation.
_EXCHANGE_NODES = ("Repartition", "Aggregate", "Window", "Deduplicate")


def _iter_plan_nodes(root):
    """Pre-order walk of a Catalyst TreeNode via py4j: yields every
    node object in the main tree (subquery expressions are not
    descended — an exchange inside a scalar subquery does not
    redistribute THIS frame's rows, so it must not veto a spread)."""
    stack = [root]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.length()):
            stack.append(children.apply(i))


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

    The decision reads the LOGICAL layout only — never ``df.rdd``,
    which under AQE finalizes the physical plan and can materialize
    upstream shuffle/broadcast stages at plan-CONSTRUCTION time, an
    extra job per call paid again on every streaming micro-batch
    (ADVICE r13). Three tiers, no Spark job in any of them:

    1. the logical plan already contains an exchange-producing node
       (Repartition — incl. the catalog's own spread — Aggregate,
       Window, Deduplicate): no-op;
    2. file-backed source (``df.inputFiles()`` non-empty — a metadata
       enumeration, not a job): estimate planned splits from file
       count/sizes with the session's split conf; no-op when ≥ cores.
       At 100 TB the file COUNT alone clears the bar before any stat.
    3. otherwise (micro-batch / local relation — layout unknowable
       without running a job): spread. Matches the old probe's
       behavior — foreachBatch frames arrive on a handful of
       partitions — without its per-batch planning job.

    Call it AFTER source filters so parquet predicate pushdown stays
    below the exchange, and only ahead of genuinely compute-bound
    kernels — an IO-shaped filter/project never needs it."""
    import os as _os

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    range_slices = None
    for node in _iter_plan_nodes(df._jdf.queryExecution().logical()):
        name = node.nodeName()
        if any(name.startswith(n) for n in _EXCHANGE_NODES):
            return df
        if name == "Range":
            # Range relations (spark.range) declare their split count
            # in the logical node itself — no files, no job needed.
            slices = node.numSlices()
            if slices.isDefined():
                range_slices = int(slices.get())
    if range_slices is not None:
        return df if range_slices >= target else df.repartition(target)
    try:
        files = df.inputFiles()
    except Exception:  # streaming frames raise AnalysisException
        files = []
    if files:
        if len(files) >= target:  # ≥1 split per file, no stat needed
            return df
        max_bytes, _ = _session_split_conf(spark)
        est = 0
        for f in files:
            local = f[7:] if f.startswith("file://") else f
            try:
                size = _os.path.getsize(local)
            except OSError:
                # unstattable scheme (object store) with few files:
                # fall through conservatively as one split per file
                size = 0
            est += max(1, -(-size // max_bytes))
            if est >= target:
                return df
        if est >= target:
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


def ensure_cached_build(
    cache_name: str, key: str, build_fn, ok_marker: str
) -> str:
    """Idempotent content-keyed cache slot for an expensive on-disk
    build (persisted ANN / FTS indexes): build into a PRIVATE temp dir,
    then one atomic rename into the slot — a racing builder loses the
    rename and discards its byte-identical copy (builds are
    deterministic by contract). Extracted in round 15 so the two index
    caches share one copy of this concurrency-sensitive dance.

    The build dir is keyed by pid AND a fresh uuid: pid alone let two
    THREADS of one process (parallel cold-cache serves) share a build
    dir, rmtree each other's half-written output, and commit a corrupt
    index under a valid marker (round-15 review finding).

    ``build_fn(build_dir)`` must leave ``ok_marker`` in the dir as its
    final act; ``key`` must fold in the corpus content fingerprint so
    a regenerated corpus invalidates the slot."""
    import os
    import shutil
    import tempfile
    import uuid

    cache_root = os.path.join(tempfile.gettempdir(), cache_name)
    dest = os.path.join(cache_root, key)
    if os.path.exists(os.path.join(dest, ok_marker)):
        return dest
    os.makedirs(cache_root, exist_ok=True)
    build = os.path.join(
        cache_root, f".build_{key}_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )
    shutil.rmtree(build, ignore_errors=True)
    # Failed builds must not leak their uuid-keyed private dir (ADVICE
    # r15: no sweep ever reuses these names, so half-written trees from
    # repeated failures accumulated under tempdir forever).
    try:
        build_fn(build)
    except BaseException:
        shutil.rmtree(build, ignore_errors=True)
        raise
    try:
        os.rename(build, dest)
    except OSError:
        if not os.path.exists(os.path.join(dest, ok_marker)):
            shutil.rmtree(build, ignore_errors=True)
            raise
        shutil.rmtree(build, ignore_errors=True)  # lost the race: reuse
    return dest
