"""Evolving FTS index (streaming/fts_ingest.py, round 15).

The authoritative assertion everywhere: BM25 served from the evolving
index as of batch n equals a FROM-SCRATCH `bm25_from_docs` over
exactly the documents ingested so far — the stream-vs-batch-twin
discipline the LSH and vector indexes certify with.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from wikid_spark.catalog import table
from wikid_spark.operators.fts import bm25_from_docs
from wikid_spark.streaming import fts_ingest as FI

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "vector"]
CUTS = [300, 350, 420, 500]  # base = <300; three appended batches


def _docs(spark, lo=None, hi=None):
    d = table(spark, SF, "documents").select("doc_id", "text")
    if lo is not None:
        d = d.filter(F.col("doc_id") >= lo)
    if hi is not None:
        d = d.filter(F.col("doc_id") < hi)
    return d


def _scores(df):
    return {
        r["doc"]: r["score"]
        for r in df.select("doc", F.round("score", 4).alias("score")).collect()
    }


def _rebuild_scores(spark, hi):
    return _scores(bm25_from_docs(_docs(spark, hi=hi), "doc_id", "text", TERMS))


def test_streamed_index_serves_equal_rebuild_per_batch(spark, tmp_path):
    idx = str(tmp_path / "fts_evolving")
    FI.persist_streaming_fts_index(_docs(spark, hi=CUTS[0]), idx)
    w = FI.fts_index_batch_writer(spark, idx)
    for bid, (lo, hi) in enumerate(zip(CUTS, CUTS[1:])):
        # serve BEFORE the append: as_of_batch=bid sees batches < bid
        assert _scores(
            FI.bm25_streaming(spark, idx, TERMS, as_of_batch=bid)
        ) == _rebuild_scores(spark, lo)
        w(_docs(spark, lo, hi), bid)
    assert _scores(FI.bm25_streaming(spark, idx, TERMS)) == _rebuild_scores(
        spark, CUTS[-1]
    )


def test_replayed_append_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "fts_replay")
    FI.persist_streaming_fts_index(_docs(spark, hi=CUTS[0]), idx)
    FI.append_docs_to_fts_index(_docs(spark, CUTS[0], CUTS[1]), idx, 0)
    want = _scores(FI.bm25_streaming(spark, idx, TERMS))
    # at-least-once replay: the batch rewrites its own partitions
    FI.append_docs_to_fts_index(_docs(spark, CUTS[0], CUTS[1]), idx, 0)
    assert _scores(FI.bm25_streaming(spark, idx, TERMS)) == want
    assert want == _rebuild_scores(spark, CUTS[1])


def test_compaction_preserves_serving_and_restores_layout(spark, tmp_path):
    idx = str(tmp_path / "fts_compact")
    FI.persist_streaming_fts_index(_docs(spark, hi=CUTS[0]), idx)
    for bid, (lo, hi) in enumerate(zip(CUTS, CUTS[1:])):
        FI.append_docs_to_fts_index(_docs(spark, lo, hi), idx, bid)
    want = _scores(FI.bm25_streaming(spark, idx, TERMS))
    FI.compact_streaming_fts_index(spark, idx)
    # deltas folded into the single base partition
    assert glob.glob(os.path.join(idx, "postings", "batch_id=*")) == [
        os.path.join(idx, "postings", "batch_id=-1")
    ]
    # one file per bucket restored (serve-side footer-cost bound)
    for d in glob.glob(
        os.path.join(idx, "postings", "batch_id=-1", "tbucket=*")
    ):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    assert _scores(FI.bm25_streaming(spark, idx, TERMS)) == want
    # ...and the index keeps evolving after compaction
    FI.append_docs_to_fts_index(
        _docs(spark, 0, 0).limit(0), idx, 99
    )  # empty batch: no-op increments
    assert _scores(FI.bm25_streaming(spark, idx, TERMS)) == want


def test_streamed_probe_is_bucket_pruned(spark, tmp_path):
    import re

    idx = str(tmp_path / "fts_pruned")
    FI.persist_streaming_fts_index(_docs(spark, hi=CUTS[0]), idx)
    FI.append_docs_to_fts_index(_docs(spark, CUTS[0], CUTS[1]), idx, 0)
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        probe = (
            FI._read(spark, idx, "postings", None)
            .filter(F.col("tbucket").isin([27, 45]))
            .filter(F.col("term").isin(TERMS))
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    m = re.search(r"PartitionFilters: \[tbucket#\d+ IN(?:SET)? \(?27,\s*45", plan)
    assert m, plan[:4000]
