"""Hybrid RRF retrieval served from the EVOLVING streaming indexes.

The production composition VERDICT r15 #4 names: one document+embedding
stream feeds LSH dedup verdicts, kept docs flow into the evolving FTS
index (`streaming.fts_ingest`) AND the evolving vector index
(`streaming.vector_ingest`), and this module serves hybrid
lexical+dense retrieval from BOTH mid-stream — the same
reciprocal-rank fusion the batch query `fts_hybrid_rrf_topk`
certifies (shared tail `queries.fts.rrf_fuse_frames`), so a serve at
any checkpoint must equal the from-scratch hybrid over exactly the
documents the indexes hold at that checkpoint (the soak's batch-twin
assertion).

Scale shape per serve:

* lexical side — `bm25_streaming`: bucket-dir-pruned postings/termstats
  reads across base + deltas (the query terms' buckets only, never the
  corpus), exact-integer df/stat partials summed;
* dense side — the vector index's ``cells`` rows as of the same batch
  horizon, deduplicated from top-2 multi-assignment, one pass against
  the broadcast query vector ending in a top-20
  (TakeOrderedAndProject). Exact by construction: the evolving index
  carries the original vectors, so the dense list is brute-force truth
  over the kept set, not cell-restricted ANN — at 100 TB swap this
  side for the persisted ANN serve (`serve_persisted_topk`) when
  approximate is acceptable; the fusion tail is unchanged either way;
* fusion — two ≤20-row frames, union + hash-agg (join-free).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wikid_spark.functions.vectors import cosine_similarity
from wikid_spark.queries.fts import rrf_fuse_frames
from wikid_spark.streaming import evolving_index as _engine
from wikid_spark.streaming.fts_ingest import bm25_streaming


def dense_topk_streaming(
    spark: SparkSession,
    vec_index_dir: str,
    query_vec_id: int,
    as_of_batch: int | None = None,
) -> DataFrame:
    """(doc, sim): exact cosine of every indexed vector (as of the
    batch horizon) against the indexed query vector, 4-rounded — the
    dense candidate list of the streaming hybrid. Top-2 cell
    multi-assignment stores each vector twice; identical payloads, so
    the dedup is value-free."""
    cells = _engine.read_part(spark, vec_index_dir, "cells", as_of_batch)
    vecs = cells.select("vec_id", "embedding").dropDuplicates(["vec_id"])
    qv = vecs.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    return (
        vecs.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc"),
            F.round(
                cosine_similarity(F.col("embedding"), F.col("qe")), 4
            ).alias("sim"),
        )
    )


def hybrid_rrf_streaming(
    spark: SparkSession,
    fts_index_dir: str,
    vec_index_dir: str,
    terms: list[str],
    query_vec_id: int,
    as_of_batch: int | None = None,
) -> DataFrame:
    """(doc, rrf, text_rank, vec_rank): the batch hybrid's exact
    semantics served from the two evolving indexes at one shared batch
    horizon — BM25 top-20 from the FTS postings, dense cosine top-20
    from the vector cells, RRF-fused (k=60) by the shared tail."""
    bm = bm25_streaming(spark, fts_index_dir, terms, as_of_batch).select(
        "doc", F.round("score", 4).alias("score")
    )
    ds = dense_topk_streaming(spark, vec_index_dir, query_vec_id, as_of_batch)
    return rrf_fuse_frames(bm, ds)
