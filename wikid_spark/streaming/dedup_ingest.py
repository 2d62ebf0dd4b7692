"""Streaming incremental dedup against a PERSISTED LSH index.

The production shape `queries/dedup.nd_incremental_dedup` stands in
for: the corpus's MinHash band signatures and shingle hashes are built
ONCE and persisted (the LSH index — same role as the FTS postings
store), and each arriving micro-batch of new documents only computes
its OWN signatures, probes the index, exact-Jaccard-verifies the
candidates, and appends per-doc keep/drop verdicts. The corpus is
never re-signed per batch — nightly cost is O(batch), not O(corpus).

Exactly-once: verdicts write to a deterministic ``batch_id=<n>`` path
in overwrite mode (the same replay-idempotency contract as
`streaming.ingest.alias_count_batch_writer`).

All logic is shared with the registered batch queries
(`band_table_from` / `shingles_from` — one implementation of the
signature math), so the streaming path cannot drift from the
oracle-certified semantics; `tests/test_streaming.py` asserts
stream-vs-batch verdict equality end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wikid_spark.queries.dedup import band_table_from, shingles_from

JACCARD_THRESHOLD = 0.2


def persist_dedup_index(corpus: DataFrame, index_dir: str) -> None:
    """Build and persist the corpus LSH index: band signatures (the
    candidate-generation side) and hashed shingles + sizes (the
    exact-verify side). One corpus pass each; at scale, write these
    bucketed by (band, sig) / doc_id so probes prune."""
    band_table_from(corpus).write.mode("overwrite").parquet(
        f"{index_dir}/bands"
    )
    sh = shingles_from(corpus).select("doc_id", F.xxhash64("sh").alias("sh"))
    sh.write.mode("overwrite").parquet(f"{index_dir}/shingles")
    sh.groupBy("doc_id").agg(F.count("*").alias("n_sh")).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/sizes")


def batch_verdicts(
    spark: SparkSession, batch: DataFrame, index_dir: str
) -> DataFrame:
    """Verdicts for one batch of (doc_id, text) against the persisted
    index: LSH candidate probe (batch bands BROADCAST into the index
    band table) → exact-Jaccard verify on candidates → min-doc_id
    dup_of attribution. Same funnel as nd_incremental_dedup, with the
    corpus side read from the index instead of recomputed."""
    corpus_bands = spark.read.parquet(f"{index_dir}/bands")
    corpus_sh = spark.read.parquet(f"{index_dir}/shingles")
    corpus_sizes = spark.read.parquet(f"{index_dir}/sizes")

    nb = band_table_from(batch).select(
        F.col("doc_id").alias("new_id"), "band", "sig"
    )
    cand = (
        corpus_bands.join(F.broadcast(nb), ["band", "sig"])
        .select("new_id", F.col("doc_id").alias("old_id"))
        .dropDuplicates()
    )
    new_sh = (
        shingles_from(batch)
        .select(F.col("doc_id").alias("new_id"), F.xxhash64("sh").alias("sh"))
    )
    new_sizes = new_sh.groupBy("new_id").agg(F.count("*").alias("n_a"))
    probe = new_sh.join(F.broadcast(cand), "new_id")
    old_docs = cand.select(F.col("old_id").alias("doc_id")).distinct()
    old_sh = corpus_sh.join(F.broadcast(old_docs), "doc_id", "left_semi")
    inter = (
        probe.join(
            old_sh.select(F.col("doc_id").alias("old_id"), "sh"),
            ["old_id", "sh"],
        )
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    ver = (
        inter.join(new_sizes, "new_id")
        .join(
            corpus_sizes.select(
                F.col("doc_id").alias("old_id"), F.col("n_sh").alias("n_b")
            ),
            "old_id",
        )
        .filter(jac >= JACCARD_THRESHOLD)
        .select("new_id", "old_id", jac.alias("j"))
    )
    best = ver.groupBy("new_id").agg(F.min("old_id").alias("dup_of"))
    bj = best.join(
        ver,
        (best["new_id"] == ver["new_id"]) & (best["dup_of"] == ver["old_id"]),
    ).select(best["new_id"].alias("doc_id"), "dup_of", F.round("j", 4).alias("jaccard"))
    return batch.select("doc_id").join(bj, "doc_id", "left").select(
        "doc_id",
        "dup_of",
        "jaccard",
        F.when(F.col("dup_of").isNull(), "keep").otherwise("drop").alias(
            "verdict"
        ),
    )


def dedup_verdict_batch_writer(
    spark: SparkSession, index_dir: str, out_dir: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: verdicts for the micro-batch, written to a
    deterministic ``batch_id=<n>`` path in overwrite mode — replayed
    batches overwrite their own output (exactly-once without a table
    format, the `alias_count_batch_writer` contract)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch_verdicts(spark, batch, index_dir).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/batch_id={batch_id}")

    return write_batch


def read_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """All verdicts appended so far (one row per streamed doc)."""
    return (
        spark.read.option("basePath", out_dir)
        .parquet(f"{out_dir}/batch_id=*")
        .select("doc_id", "dup_of", "jaccard", "verdict")
    )
