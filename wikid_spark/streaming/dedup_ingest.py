"""Streaming incremental dedup against a persisted, EVOLVING LSH index.

The production shape `queries/dedup.nd_incremental_dedup` stands in
for: the corpus's MinHash band signatures and shingle hashes are built
ONCE and persisted (the LSH index — same role as the FTS postings
store), and each arriving micro-batch of new documents only computes
its OWN signatures, probes the index, exact-Jaccard-verifies the
candidates, and appends per-doc keep/drop verdicts. The corpus is
never re-signed per batch — nightly cost is O(batch), not O(corpus).

The index EVOLVES (read-your-own-writes across batches): after a
batch's verdicts commit, its KEPT documents' band signatures, shingle
hashes and sizes are appended to the index under deterministic
``batch_id=<n>`` partitions, so a near-dup arriving in a later
micro-batch is caught against them — the normal case for a nightly
ingest whose batches contain dups of each other (the reference's
incremental anti-join restart likewise sees prior writes,
/root/reference/scripts/wiki/wikipedia.py:280-282). A batch's OWN
probe reads strictly ``batch_id < n`` partitions, which makes replay
deterministic: a redelivered batch sees exactly the index state its
first attempt saw, regardless of whether its own appends already
landed. Batches are assumed sequential (Structured Streaming's
contract): a crashed batch replays before the next one starts, so a
torn append (bands landed, shingles not) is always overwritten before
any later batch can read it.

Exactly-once: verdicts AND index appends write to deterministic
``batch_id=<n>`` paths in overwrite mode (the same replay-idempotency
contract as `streaming.ingest.alias_count_batch_writer`).

Two physical layouts share one logical schema:

* **Path-partitioned parquet** (`persist_dedup_index` /
  `batch_verdicts`): base under ``batch_id=-1``, appends under their
  batch id — the evolving form the stream writes.
* **Bucketed catalog tables** (`persist_dedup_index_bucketed` /
  `bucketed_batch_verdicts`): the static/compacted base at scale,
  bands bucketed by a single derived ``bsig = xxhash64(band, sig)``
  column and shingles/sizes by ``doc_id``, so a batch probe
  bucket-prunes (``SelectedBucketsCount`` in the scan — Spark prunes
  only single-column bucket specs, hence the derived key) instead of
  scanning the whole index. `compact_dedup_index` folds accumulated
  deltas into such a base, the LSM discipline `streaming.ingest`
  applies to its merge log.

All signature math is shared with the registered batch queries
(`band_table_from` / `shingles_from` — one implementation), so the
streaming path cannot drift from the oracle-certified semantics;
`tests/test_streaming.py` asserts stream-vs-batch verdict equality
end-to-end in both static and evolving modes.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wikid_spark.queries.dedup import band_table_from, shingles_from
from wikid_spark.streaming.evolving_index import (  # noqa: F401 — re-exported
    BASE_BATCH_ID,
    compact_index_parts,
    read_verdict_log,
)
from wikid_spark.streaming import evolving_index as _engine

JACCARD_THRESHOLD = 0.2
# Max candidate doc ids to inline as IN-literals for bucket-pruned
# verify scans; above this the fetch falls back to a semi-join.
CAND_PUSHDOWN_MAX_IDS = 100_000

_read_part = _engine.read_part  # shared lifecycle; local alias


def _hashed_shingles(docs: DataFrame) -> DataFrame:
    return shingles_from(docs).select(
        "doc_id", F.xxhash64("sh").alias("sh")
    )


def _sign_lsh(docs: DataFrame, index_dir: str) -> dict:
    """The LSH index's `sign` kernel for the shared evolving-index
    engine: band signatures (candidate generation) plus hashed
    shingles and sizes (exact verify)."""
    sh = _hashed_shingles(docs)
    return {
        "bands": (band_table_from(docs), ()),
        "shingles": (sh, ()),
        "sizes": (
            sh.groupBy("doc_id").agg(F.count("*").alias("n_sh")),
            (),
        ),
    }


def persist_dedup_index(corpus: DataFrame, index_dir: str) -> None:
    """Build and persist the corpus LSH index: band signatures (the
    candidate-generation side) and hashed shingles + sizes (the
    exact-verify side), under ``batch_id=-1`` partitions so streaming
    appends evolve the same tree. For the bucket-pruned catalog-table
    form at scale, see `persist_dedup_index_bucketed`."""
    _engine.persist_index(_sign_lsh, corpus, index_dir)


def append_kept_to_index(
    batch: DataFrame, kept_ids: DataFrame, index_dir: str, batch_id: int
) -> None:
    """Append the kept docs' signatures under this batch's partitions —
    overwrite mode, so a replayed batch rewrites its own appends
    byte-identically instead of duplicating them."""
    _engine.append_kept(
        _sign_lsh, batch, kept_ids, "doc_id", index_dir, batch_id
    )


def _verify_verdicts(
    batch: DataFrame,
    cand: DataFrame,
    corpus_sh: DataFrame,
    corpus_sizes: DataFrame,
) -> DataFrame:
    """Shared tail of both probe paths: exact-Jaccard verify the LSH
    candidates, min-doc_id dup_of attribution, one verdict row per
    batch doc. Same funnel as nd_incremental_dedup: the (tiny)
    candidate set broadcasts into the shingle probes; the corpus
    shingle table is semi-filtered to candidate docs only."""
    new_sh = _hashed_shingles(batch).select(
        F.col("doc_id").alias("new_id"), "sh"
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


def batch_verdicts(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    as_of_batch: int | None = None,
) -> DataFrame:
    """Verdicts for one batch of (doc_id, text) against the persisted
    index as of ``as_of_batch`` (None = whole index): LSH candidate
    probe (batch bands BROADCAST into the index band table) → exact
    verify → verdict. The corpus side is read from the index, never
    recomputed."""
    nb = band_table_from(batch).select(
        F.col("doc_id").alias("new_id"), "band", "sig"
    )
    cand = (
        _read_part(spark, index_dir, "bands", as_of_batch)
        .join(F.broadcast(nb), ["band", "sig"])
        .select("new_id", F.col("doc_id").alias("old_id"))
        # self-guard: with as_of_batch=None (whole index) or after
        # compaction folded a batch's own appends into the base, an
        # already-ingested doc would otherwise match ITSELF at
        # jaccard 1.0 and flip its verdict to drop
        .filter(F.col("old_id") != F.col("new_id"))
        .dropDuplicates()
    )
    return _verify_verdicts(
        batch,
        cand,
        _read_part(spark, index_dir, "shingles", as_of_batch),
        _read_part(spark, index_dir, "sizes", as_of_batch),
    )


def dedup_verdict_batch_writer(
    spark: SparkSession, index_dir: str, out_dir: str, evolve: bool = True
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: verdicts for the micro-batch, written to a
    deterministic ``batch_id=<n>`` path in overwrite mode — replayed
    batches overwrite their own output (exactly-once without a table
    format, the `alias_count_batch_writer` contract).

    With ``evolve=True`` (the production default) each batch's kept
    docs are appended to the index after the verdicts commit, so
    later batches dedup against them; the probe reads strictly
    ``batch_id < n``, keeping replays deterministic. ``evolve=False``
    probes the static corpus-only index — the exact semantics of the
    registered `nd_incremental_dedup` batch query."""
    return _engine.verdict_batch_writer(
        spark,
        index_dir,
        out_dir,
        probe=batch_verdicts,
        sign=_sign_lsh,
        id_col="doc_id",
        evolve=evolve,
    )


def read_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """All verdicts appended so far (one row per streamed doc)."""
    return read_verdict_log(
        spark, out_dir, ("doc_id", "dup_of", "jaccard", "verdict")
    )


# ---------------------------------------------------------------------------
# Bucketed catalog-table index: the compacted base at scale. At 100 TB
# the band table is corpus × 8 rows; a micro-batch probe must not scan
# it. Bucketing by one derived key and filtering with the batch's
# (bounded: |batch| × 8 values) literal key set turns the probe into a
# SelectedBucketsCount-pruned scan of ~|batch keys| buckets.
# ---------------------------------------------------------------------------


def persist_dedup_index_bucketed(
    spark: SparkSession, corpus: DataFrame, prefix: str, buckets: int = 16
) -> None:
    """Catalog-table form of the LSH index via `sources.bucketed`'s
    layout discipline: bands bucketed+sorted by ``bsig =
    xxhash64(band, sig)`` (single column — Spark's bucket pruning
    requires it), shingles and sizes by ``doc_id`` for the verify
    fetch. ``prefix`` names the tables ``{prefix}_bands`` /
    ``_shingles`` / ``_sizes``."""
    sh = _hashed_shingles(corpus)
    _write_bucketed_index(
        spark, band_table_from(corpus), sh, prefix, buckets
    )


def _write_bucketed_index(
    spark: SparkSession,
    bands: DataFrame,
    shingles: DataFrame,
    prefix: str,
    buckets: int,
) -> None:
    """Write (bands, shingles) index components as the bucket-pruned
    catalog tables; sizes are re-derived from shingles (one count per
    doc — cheaper than carrying a third component through)."""
    (
        bands.withColumn("bsig", F.xxhash64("band", "sig"))
        .write.mode("overwrite")
        .bucketBy(buckets, "bsig")
        .sortBy("bsig")
        .saveAsTable(f"{prefix}_bands")
    )
    (
        shingles.write.mode("overwrite")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(f"{prefix}_shingles")
    )
    (
        shingles.groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
        .write.mode("overwrite")
        .bucketBy(buckets, "doc_id")
        .saveAsTable(f"{prefix}_sizes")
    )


def compact_dedup_index_bucketed(
    spark: SparkSession, index_dir: str, prefix: str, buckets: int = 16
) -> None:
    """The LSM cycle's fold step, ending in the SERVING layout:
    base + accumulated per-batch deltas of the path-partitioned index
    are read back (no corpus re-signing — the signatures were computed
    when the docs arrived) and rewritten as the bucketed catalog
    tables `bucketed_batch_verdicts` probes with bucket pruning. Run
    between streaming jobs: stream-append (L0 deltas) →
    `compact_dedup_index` (heal/fold the path tree) → this (publish
    the folded base in bucketed form) → probes prune again. On a real
    deployment the two compaction steps fuse into one write; they stay
    separate here because the path tree remains the stream's append
    target while the bucketed tables serve probes."""
    compact_dedup_index(spark, index_dir)
    _write_bucketed_index(
        spark,
        _read_part(spark, index_dir, "bands", None),
        _read_part(spark, index_dir, "shingles", None),
        prefix,
        buckets,
    )


def bucketed_batch_verdicts(
    spark: SparkSession, batch: DataFrame, prefix: str
) -> DataFrame:
    """`batch_verdicts` against the bucketed index: the batch's band
    keys and then the candidate doc ids are collected (both bounded by
    the micro-batch size, not the corpus) and pushed as IN-filters on
    the bucket columns, so every index scan is bucket-pruned."""
    nb = band_table_from(batch).select(
        F.col("doc_id").alias("new_id"), "band", "sig"
    ).localCheckpoint(eager=True)  # sign the batch once, not per reuse
    bsigs = [
        r[0]
        for r in nb.select(F.xxhash64("band", "sig").alias("b"))
        .distinct()
        .collect()
    ]
    cand = (
        spark.table(f"{prefix}_bands")
        .filter(F.col("bsig").isin(bsigs))
        .drop("bsig")
        .join(F.broadcast(nb), ["band", "sig"])
        .select("new_id", F.col("doc_id").alias("old_id"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    # The candidate doc-id set scales with the batch's MATCH count, not
    # the batch size — on a high-dup-rate corpus it can be huge (the
    # same dup-rate dial as PAIR_BROADCAST_MAX_ROWS). Below the cap the
    # ids push down as IN-literals and the scans bucket-prune; above
    # it, fall back to a semi-join (still bucket-local on doc_id).
    old_ids_df = cand.select(F.col("old_id").alias("doc_id")).distinct()
    n_old = old_ids_df.count()
    if n_old <= CAND_PUSHDOWN_MAX_IDS:
        old_ids = [r[0] for r in old_ids_df.collect()]
        corpus_sh = spark.table(f"{prefix}_shingles").filter(
            F.col("doc_id").isin(old_ids)
        )
        corpus_sizes = spark.table(f"{prefix}_sizes").filter(
            F.col("doc_id").isin(old_ids)
        )
    else:
        corpus_sh = spark.table(f"{prefix}_shingles").join(
            old_ids_df, "doc_id", "left_semi"
        )
        corpus_sizes = spark.table(f"{prefix}_sizes").join(
            old_ids_df, "doc_id", "left_semi"
        )
    return _verify_verdicts(batch, cand, corpus_sh, corpus_sizes)


def compact_dedup_index(spark: SparkSession, index_dir: str) -> None:
    """Fold base + accumulated per-batch deltas back into a single
    ``batch_id=-1`` base. Run between streaming jobs, not concurrently
    with one. Crash-safety contract and heal states:
    `evolving_index.compact_index_parts` (shared with the vector
    index; the crash tests in test_streaming.py pin them through this
    entry point)."""
    compact_index_parts(spark, index_dir, ("bands", "shingles", "sizes"))
