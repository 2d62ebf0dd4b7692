"""Micro-batch ingestion with exactly-once additive merge.

Replaces the reference's hand-rolled idempotency — pre-scanned id sets
+ `ON CONFLICT … count=count+excluded.count` upserts
(wikidata.py:90-92, 262-269; wikipedia.py:280-282, 108-115 in
/root/reference/scripts/wiki/) — with the Spark-native contract:

* **foreachBatch + checkpoint** gives at-least-once batch delivery with
  a monotonically increasing ``batch_id``.
* Each batch writes its own partial aggregate to a DETERMINISTIC path
  keyed by ``batch_id`` in overwrite mode — a replayed batch overwrites
  its own previous output, so the sink is effectively exactly-once
  without any table format dependency (the same pattern Delta's MERGE
  would subsume on a cluster with Delta available).
* Readers merge the partials by re-aggregation (associative SUM —
  `plans.wiki.merge_alias_counts` semantics), so no reader ever sees a
  torn update. ``compact`` folds the log when the partial count grows.

This is the log-structured-merge shape that scales: every batch write
is append-only and partition-local; the only global operation is the
read-side groupBy, which AQE sizes at runtime.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def alias_count_batch_writer(target_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: partial-aggregate the micro-batch and write it
    under ``batch_id=<n>`` (overwrite → replay-idempotent)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        (
            batch.groupBy("alias", "entity_id")
            .agg(F.sum("count").alias("count"))
            .write.mode("overwrite")
            .parquet(f"{target_dir}/batch_id={batch_id}")
        )

    return write_batch


def read_alias_counts(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merged view over all batch partials (associative re-aggregation)."""
    log = spark.read.option("basePath", target_dir).parquet(
        f"{target_dir}/batch_id=*"
    )
    return (
        log.groupBy("alias", "entity_id")
        .agg(F.sum("count").alias("count"))
    )


def compact(spark: SparkSession, target_dir: str, into: str) -> None:
    """Fold the batch log into one base partial at ``into`` (a new
    batch_id directory outside the streaming counter range). Caller
    removes the old partials after the write commits."""
    read_alias_counts(spark, target_dir).write.mode("overwrite").parquet(into)


def start_alias_count_ingest(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire a streaming alias-count source into the merge sink.

    ``available_now=True`` drains everything currently in the source
    then stops — the batch-equivalent mode the tests (and backfills)
    use; ``False`` runs continuously on micro-batch triggers.
    """
    writer = (
        stream.writeStream.foreachBatch(alias_count_batch_writer(target_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
