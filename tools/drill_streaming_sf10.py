"""Round-16 scale drill: evolving-index INGEST cost vs corpus size.

The streaming modules' scale claim is that per-micro-batch cost follows
the BATCH, not the corpus: verdict probes read only the cells/buckets
the batch touches (directory-pruned), and appends write only the
batch's own partitions. This drill builds the full three-index soak
shape (LSH dedup + evolving FTS + evolving vector index) at sf0.1
(5k docs / 2k vectors) and sf10 (500k / 200k — 100x), runs ONE
identical 100-doc micro-batch through the composed writer at each
scale, and serves the streaming hybrid once.

Expected shape (and what round-16 measured — see SCALE.md):
* index BUILDS scale ~linearly with the corpus (one-time);
* the composed per-batch writer (LSH verdicts + FTS append of kept +
  vector verdicts/append) grows far sublinearly — its probes are
  bounded by the batch's touched buckets/cells;
* the hybrid SERVE is corpus-dependent by design at this layer: the
  BM25 side reads the query terms' postings (df ~ n/31 on the closed
  vocabulary) and the dense side is the documented exact brute pass —
  the corpus-scale serving path is the persisted ANN/FTS indexes
  (serve_persisted_topk / fts_serve_persisted), already drilled.

Usage: python tools/drill_streaming_sf10.py [SF10_DIR]
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F


def drill(spark, sf_dir: str, tag: str, workdir: str) -> dict:
    from wikid_spark.catalog import corpus_rows, table
    from wikid_spark.streaming import (
        dedup_ingest,
        fts_ingest as FI,
        hybrid as HY,
        vector_ingest as vi,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    vecs = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_docs = corpus_rows(sf_dir, "documents")
    n_vecs = corpus_rows(sf_dir, "embeddings")

    lsh_idx = f"{workdir}/lsh_{tag}"
    fts_idx = f"{workdir}/fts_{tag}"
    vidx = f"{workdir}/vec_{tag}"

    t0 = time.perf_counter()
    dedup_ingest.persist_dedup_index(docs, lsh_idx)
    FI.persist_streaming_fts_index(docs, fts_idx)
    vi.persist_vector_index(vecs, vidx)
    build_s = time.perf_counter() - t0

    # one 100-doc micro-batch: real corpus rows with shifted ids (the
    # same text/vector distribution the indexes hold)
    batch = (
        docs.orderBy("doc_id")
        .limit(100)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .join(
            vecs.orderBy("vec_id")
            .limit(100)
            .withColumn("vec_id", F.col("vec_id") + 10_000_000),
            F.col("doc_id") == F.col("vec_id"),
        )
        .select("doc_id", "text", "embedding")
        .localCheckpoint(eager=True)
    )

    lsh_out = f"{workdir}/lshout_{tag}"
    vec_out = f"{workdir}/vecout_{tag}"
    lsh_w = dedup_ingest.dedup_verdict_batch_writer(spark, lsh_idx, lsh_out)
    vec_w = vi.vector_verdict_batch_writer(spark, vidx, vec_out)
    fts_w = FI.fts_index_batch_writer(spark, fts_idx)

    t0 = time.perf_counter()
    lsh_w(batch.select("doc_id", "text"), 0)
    kept = (
        dedup_ingest.read_verdicts(spark, lsh_out)
        .filter(F.col("verdict") == "keep")
        .select("doc_id")
    )
    fts_w(
        batch.select("doc_id", "text").join(
            F.broadcast(kept), "doc_id", "left_semi"
        ),
        0,
    )
    vec_w(batch.select(F.col("doc_id").alias("vec_id"), "embedding"), 0)
    batch_s = time.perf_counter() - t0

    qid = int(vecs.orderBy("vec_id").first()["vec_id"])
    t0 = time.perf_counter()
    n_served = HY.hybrid_rrf_streaming(
        spark, fts_idx, vidx, ["spark", "vector"], qid
    ).count()
    serve_s = time.perf_counter() - t0

    return {
        "scale": tag,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "build_s": round(build_s, 2),
        "batch_s": round(batch_s, 2),
        "serve_s": round(serve_s, 2),
        "served_rows": n_served,
    }


def main() -> None:
    import tempfile

    from wikid_spark.session import get_spark

    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_r16"
    spark = get_spark(app_name="drill_streaming_sf10")
    workdir = tempfile.mkdtemp(prefix="drill_stream_")
    for sf_dir, tag in (("/root/testdata/sf0.1", "sf0.1"), (sf10, "sf10")):
        print(json.dumps(drill(spark, sf_dir, tag, workdir)), flush=True)


if __name__ == "__main__":
    main()
