"""SparkSession factory.

Defaults are chosen for the driver's environment (local[32], 128 GiB,
single JVM) but every setting is the one we would also ship to a
1000-executor cluster: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), UTC session timezone (deterministic timestamp
semantics vs the DuckDB oracle), Arrow transfer for the few pandas-UDF
kernels, and shuffle partitions sized to the local core count — on a real
cluster AQE coalesces the 2000-partition default down to demand.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "wikid_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS``
    so tests, bench, and the driver all agree.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Fine-grained INITIAL shuffle partitioning, coalesced down by
        # AQE to demand: shuffle.partitions alone caps parallelism AND
        # per-task input size at once, so at sf10 a 32-way exact-verify
        # join put multi-GB partitions in front of 32 concurrent tasks
        # and exhausted the shared 8 GiB local-mode heap (hash-agg
        # buffers scale with partition size; spill read-ahead OOM'd).
        # With a high initial count each task's slice stays heap-sized
        # at any SF, while AQE's target-size coalescing keeps small-SF
        # runs at the same effective partition count as before — this
        # is the config pair we'd ship to a 1000-executor cluster.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", str(max(256, 8 * cpus))),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate derives `size(g) > 0 AND isnotnull(g)`
        # from every inner explode/posexplode and pushes it below the
        # projection WITH THE GENERATOR INPUT INLINED — for our
        # generators (tokenize arrays, shingle/bigram HOFs, LSH bucket
        # kernels) that re-evaluates the expensive expression 1-2 extra
        # times per row, and for pandas-UDF inputs it plans a SECOND
        # ArrowEvalPython. Round-16 interleaved A/B with the rule
        # excluded: sim_lsh_multitable_topk −57%, fts_bm25_topk −21%,
        # q22_explode_wordcount −9%, nothing slower, results identical
        # (the rule is row-pruning only — Generate already skips empty
        # arrays; the filter can't reach parquet pushdown because the
        # expressions are post-scan). Semantics-preserving, so the
        # driver's bare-session correctness runs are unaffected.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet scans: vectorized reads + pushdown are defaults, pinned
        # here so a misconfigured cluster profile can't silently lose them.
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS); read as int64 ns and
        # convert in the catalog (see catalog.table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=error")
    )
    return builder.getOrCreate()
