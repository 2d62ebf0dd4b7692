"""Round-13 streaming soak (VERDICT r12 item 7).

ONE long multi-batch file-source stream feeds the composed production
surface in a single ``foreachBatch``: evolving LSH text dedup AND
evolving vector (embedding) dedup, while a tumbling-window aggregation
runs over the same source. Halfway through the stream a crash is
injected mid-compaction on BOTH indexes (the between-the-two-renames
state), healed by re-running compaction, and the stream resumes from
its checkpoint. Final verdict state must equal the batch twin — direct
per-batch writer calls on never-compacted parallel indexes — byte for
byte per batch partition, and the windowed counts must equal the batch
aggregation.

What the composition certifies beyond the per-module suites:
* text and vector dedup share one micro-batch (one source read, two
  probes, two index appends) without interfering;
* a mid-stream crash-heal-compact cycle changes NOTHING observable —
  later cross-batch near-dups still resolve to pre-compaction
  survivors (their signatures rode the fold into the base);
* checkpoint resume continues batch numbering so the evolving
  ``batch_id < n`` probe contract spans the restart.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
import pytest

# Wall-clock streaming soaks (~400 s at local[4]) — excluded from the
# default run so the suite fits the driver's verify budget (VERDICT
# r16 #3, pytest.ini). The per-module streaming/ingest suites keep
# every operator covered by default; run these with -m soak / -m "".
pytestmark = pytest.mark.soak

from wikid_spark.streaming import dedup_ingest, vector_ingest as vi
from wikid_spark.streaming.windows import tumbling_counts

# --- corpus: 12 docs, each with a disjoint 10-word text and an
# embedding in one of three well-separated clusters (cosine < 0.4
# across clusters, the serving threshold) ---------------------------

_WORDS = [
    "oak maple birch cedar willow pine elm ash fir spruce",
    "red orange yellow green blue indigo violet purple pink teal",
    "copper zinc nickel cobalt iron tungsten chromium manganese titanium vanadium",
    "sonata concerto symphony etude nocturne prelude fugue rhapsody waltz mazurka",
    "tundra savanna prairie steppe taiga chaparral wetland mangrove dune reef",
    "femur tibia fibula patella humerus radius ulna sternum clavicle scapula",
    "cumulus stratus cirrus nimbus altocumulus fog drizzle sleet hail graupel",
    "krona dinar rupee peso zloty forint baht ringgit dirham guilder",
    "basalt granite gneiss schist marble quartzite obsidian pumice shale slate",
    "adagio allegro andante presto largo vivace moderato lento grave accelerando",
    "kayak canoe sloop ketch yawl schooner dinghy catamaran trawler barge",
    "saffron cumin coriander turmeric cardamom clove nutmeg anise fennel paprika",
]

_A = [5.0, 0.0, 1.0, 0.0, 2.0, 0.0, 0.0, 1.0]
_B = [0.0, 4.0, 0.0, 2.0, 0.0, 1.0, 1.0, 0.0]
_C = [1.0, 1.0, 5.0, 0.0, 0.0, 2.0, 0.0, 0.0]
_V_N = [0.0] * 7 + [9.0]          # novel cluster, arrives in batch 0
_V_M = [0.0] * 6 + [9.0, 0.0]     # novel cluster, arrives post-compaction
_V_P = [0.0] * 4 + [9.0, 0.0, 0.0, 0.0]  # novel, cos(_A)≈0.36 < 0.4


def _vec(base, eps=0.0):
    return [float(b) + eps for b in base]


def _corpus_rows():
    rows = []
    for i in range(12):
        rows.append((i + 1, _WORDS[i], _vec((_A, _B, _C)[i // 4], eps=0.01 * (i % 4))))
    return rows


_T_A = "quantum entanglement allows correlated measurement outcomes across distance boundaries today"
_T_A_NEAR = "quantum entanglement allows correlated measurement outcomes across distance boundaries tomorrow"
_T_U = "gravel cement asphalt concrete mortar brick tile plaster stone lime"
_T_U_NEAR = "gravel cement asphalt concrete mortar brick tile plaster stone chalk"
_T_CORP1_NEAR = "oak maple birch cedar willow pine elm ash fir hemlock"
_T_X = "lighthouse beacon harbor jetty breakwater quay wharf mooring buoy anchorage"

# One doc per micro-batch; expectations in the comments are asserted
# as spot checks, but the authoritative assertion is twin equality.
_INCOMING = [
    # (doc_id, text, embedding, ts, event_type)
    (100, _T_A, _V_N, "2024-06-01 10:05:00", "add"),          # keep / keep
    (101, _T_U, _vec(_A, 0.005), "2024-06-01 10:20:00", "edit"),  # keep / drop→1
    (102, _T_A_NEAR, _vec(_V_N, 0.01), "2024-06-01 10:40:00", "add"),  # drop→100 / drop→100
    # --- crash mid-compaction injected here ---
    (103, _T_CORP1_NEAR, _V_M, "2024-06-01 11:05:00", "edit"),  # drop→1 / keep
    (104, _T_X, _vec(_V_M, 0.01), "2024-06-01 11:20:00", "add"),   # keep / drop→103
    (105, _T_U_NEAR, _V_P, "2024-06-01 11:40:00", "edit"),      # drop→101 / keep
]

_SCHEMA = (
    "doc_id bigint, text string, embedding array<double>, "
    "ts string, event_type string"
)


def _write_files(src: str, specs, start_idx: int) -> None:
    """One json file per spec, mtimes strictly increasing across the
    whole stream so maxFilesPerTrigger=1 admits them in order."""
    now = time.time()
    for k, (doc_id, text, emb, ts, et) in enumerate(specs):
        i = start_idx + k
        path = f"{src}/f{i}.json"
        with open(path, "w") as f:
            f.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "embedding": emb,
                        "ts": ts,
                        "event_type": et,
                    }
                )
                + "\n"
            )
        os.utime(path, (now - 600 + 10 * i, now - 600 + 10 * i))


def _composite_writer(spark, lsh_idx, lsh_out, vidx, vec_out):
    lsh_w = dedup_ingest.dedup_verdict_batch_writer(spark, lsh_idx, lsh_out)
    vec_w = vi.vector_verdict_batch_writer(spark, vidx, vec_out)

    def write(batch, batch_id):
        lsh_w(batch.select("doc_id", "text"), batch_id)
        vec_w(
            batch.select(F.col("doc_id").alias("vec_id"), "embedding"),
            batch_id,
        )

    return write


def _drain(spark, src, ckpt, writer):
    q = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _log(spark, out_dir):
    """Full verdict log including the batch_id partition column —
    comparing it pins the file→batch mapping, not just the verdicts."""
    df = spark.read.option("basePath", out_dir).parquet(f"{out_dir}/batch_id=*")
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_streaming_soak_composed_crash_heal(spark, tmp_path):
    corpus = spark.createDataFrame(_corpus_rows(), _SCHEMA.split(", ts")[0])

    # --- streaming path ---------------------------------------------
    lsh_idx = str(tmp_path / "lsh_idx")
    vidx = str(tmp_path / "vidx")
    dedup_ingest.persist_dedup_index(corpus.select("doc_id", "text"), lsh_idx)
    vi.persist_vector_index(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"), vidx
    )

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    lsh_out = str(tmp_path / "lsh_verdicts")
    vec_out = str(tmp_path / "vec_verdicts")
    ckpt = str(tmp_path / "ckpt")
    writer = _composite_writer(spark, lsh_idx, lsh_out, vidx, vec_out)

    _write_files(src, _INCOMING[:3], 0)
    _drain(spark, src, ckpt, writer)

    # Crash mid-compaction on BOTH indexes: the instant between
    # rename(live, old) and rename(tmp, live) — live gone, .old is the
    # only complete copy. Re-running compaction must heal AND fold.
    os.rename(f"{lsh_idx}/bands", f"{lsh_idx}/bands.old")
    os.rename(f"{vidx}/cells", f"{vidx}/cells.old")
    dedup_ingest.compact_dedup_index(spark, lsh_idx)
    vi.compact_vector_index(spark, vidx)
    for idx, part in ((lsh_idx, "bands"), (lsh_idx, "shingles"), (vidx, "cells")):
        kids = os.listdir(f"{idx}/{part}")
        assert [k for k in kids if k.startswith("batch_id=")] == ["batch_id=-1"]

    # resume: new files, SAME checkpoint → batch ids continue 3,4,5
    _write_files(src, _INCOMING[3:], 3)
    _drain(spark, src, ckpt, writer)

    # --- batch twin: same batches, direct writer calls, NO compaction
    lsh_idx_t = str(tmp_path / "lsh_idx_twin")
    vidx_t = str(tmp_path / "vidx_twin")
    dedup_ingest.persist_dedup_index(corpus.select("doc_id", "text"), lsh_idx_t)
    vi.persist_vector_index(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"), vidx_t
    )
    lsh_out_t = str(tmp_path / "lsh_verdicts_twin")
    vec_out_t = str(tmp_path / "vec_verdicts_twin")
    twin = _composite_writer(spark, lsh_idx_t, lsh_out_t, vidx_t, vec_out_t)
    for bid, spec in enumerate(_INCOMING):
        twin(spark.createDataFrame([spec], _SCHEMA), bid)

    assert _log(spark, lsh_out) == _log(spark, lsh_out_t)
    assert _log(spark, vec_out) == _log(spark, vec_out_t)

    # --- spot checks (documented expectations, incl. the two
    # cross-compaction-boundary resolutions) ---------------------------
    lsh = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in dedup_ingest.read_verdicts(spark, lsh_out).collect()
    }
    vec = {
        r["vec_id"]: (r["verdict"], r["dup_of"])
        for r in vi.read_vector_verdicts(spark, vec_out).collect()
    }
    assert lsh[100] == ("keep", None) and vec[100] == ("keep", None)
    assert lsh[101] == ("keep", None) and vec[101] == ("drop", 1)
    assert lsh[102] == ("drop", 100) and vec[102] == ("drop", 100)
    assert lsh[103] == ("drop", 1) and vec[103] == ("keep", None)
    # 104's vector dups 103, KEPT and appended AFTER the compaction
    assert lsh[104] == ("keep", None) and vec[104] == ("drop", 103)
    # 105's text dups 101, kept BEFORE the compaction → folded survivor
    assert lsh[105] == ("drop", 101) and vec[105] == ("keep", None)

    # --- windows over the same source: stream == batch twin ----------
    stream_ev = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        tumbling_counts(stream_ev, window="1 hour")
        .writeStream.format("memory")
        .queryName("soak_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_w = sorted(map(tuple, spark.table("soak_windows").collect()))
    batch_ev = spark.createDataFrame(_INCOMING, _SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    )
    want_w = sorted(map(tuple, tumbling_counts(batch_ev, window="1 hour").collect()))
    assert got_w == want_w and len(got_w) == 4

    # --- final compaction, then fresh probes against survivors from
    # BOTH sides of the crash boundary ---------------------------------
    dedup_ingest.compact_dedup_index(spark, lsh_idx)
    vi.compact_vector_index(spark, vidx)
    probe_t = spark.createDataFrame(
        [(900, _T_X.replace("anchorage", "berth"))], "doc_id bigint, text string"
    )
    got_t = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in dedup_ingest.batch_verdicts(spark, probe_t, lsh_idx).collect()
    }
    assert got_t[900] == ("drop", 104)
    probe_v = spark.createDataFrame(
        [(901, _vec(_V_M, 0.02))], "vec_id bigint, embedding array<double>"
    )
    got_v = {
        r["vec_id"]: (r["verdict"], r["dup_of"])
        for r in vi.vector_batch_verdicts(spark, probe_v, vidx).collect()
    }
    assert got_v[901] == ("drop", 103)


def test_soak_forced_refresh_swaps_index_under_live_stream(spark, tmp_path):
    """Verdict r14 #7: `refresh_ann_index` (forced) runs BETWEEN
    micro-batches of the vector-ingest stream while every micro-batch
    also SERVES from the persisted ANN index inside foreachBatch —
    handle invalidation under live traffic, not in isolation.

    Pinned: pre-swap in-stream serves equal a never-refreshed twin
    build of the old corpus; post-swap serves equal a fresh build of
    the new corpus (same checkpoint, stream uninterrupted); the
    session handle is re-listed after the swap; and the stream's own
    dedup verdicts are byte-equal to its direct-writer batch twin."""
    import wikid_spark.queries.similarity as S

    SF = "/root/testdata/sf0.001"
    SF2 = "/root/testdata/sf0.01"

    # live index + never-refreshed reference twins
    idx = str(tmp_path / "ann_live")
    S.persist_ann_index(spark, SF, idx)
    twin_old = str(tmp_path / "ann_twin_old")
    S.persist_ann_index(spark, SF, twin_old)
    twin_new = str(tmp_path / "ann_twin_new")
    S.persist_ann_index(spark, SF2, twin_new)
    want_old = sorted(
        map(tuple, S.serve_persisted_topk(spark, SF, twin_old, nprobe=4).collect())
    )
    want_new = sorted(
        map(tuple, S.serve_persisted_topk(spark, SF2, twin_new, nprobe=4).collect())
    )
    assert want_old != want_new  # the swap is observable

    h1 = S.load_ann_index(spark, idx)  # populate the handle cache

    # vector-ingest stream whose writer ALSO serves from the live index
    vidx = str(tmp_path / "vidx")
    corpus = spark.createDataFrame(_corpus_rows(), _SCHEMA.split(", ts")[0])
    vi.persist_vector_index(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"), vidx
    )
    vec_out = str(tmp_path / "vec_verdicts")
    vec_w = vi.vector_verdict_batch_writer(spark, vidx, vec_out)
    serve_sf = {"dir": SF}
    in_stream_serves: list[tuple[int, list]] = []

    def writer(batch, batch_id):
        vec_w(
            batch.select(F.col("doc_id").alias("vec_id"), "embedding"),
            batch_id,
        )
        got = sorted(
            map(
                tuple,
                S.serve_persisted_topk(
                    spark, serve_sf["dir"], idx, nprobe=4
                ).collect(),
            )
        )
        in_stream_serves.append((batch_id, got))

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    _write_files(src, _INCOMING[:3], 0)
    _drain(spark, src, ckpt, writer)
    assert [b for b, _ in in_stream_serves] == [0, 1, 2]
    assert all(got == want_old for _, got in in_stream_serves)

    # forced refresh between micro-batches: retrain on the NEW corpus
    rep = S.refresh_ann_index(spark, SF2, idx, force=True)
    assert rep["refreshed"] is True
    serve_sf["dir"] = SF2

    # same checkpoint, stream resumes; serves now read the new artifacts
    _write_files(src, _INCOMING[3:], 3)
    _drain(spark, src, ckpt, writer)
    assert [b for b, _ in in_stream_serves] == [0, 1, 2, 3, 4, 5]
    assert all(got == want_new for _, got in in_stream_serves[3:])

    # the pinned session handle was invalidated by the swap
    h2 = S.load_ann_index(spark, idx)
    assert h2 is not h1

    # the stream's own verdicts are untouched by the refresh: equal to
    # the direct-writer batch twin
    vidx_t = str(tmp_path / "vidx_twin")
    vi.persist_vector_index(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"), vidx_t
    )
    vec_out_t = str(tmp_path / "vec_verdicts_twin")
    twin_w = vi.vector_verdict_batch_writer(spark, vidx_t, vec_out_t)
    for bid, spec in enumerate(_INCOMING):
        twin_w(
            spark.createDataFrame([spec], _SCHEMA).select(
                F.col("doc_id").alias("vec_id"), "embedding"
            ),
            bid,
        )
    assert _log(spark, vec_out) == _log(spark, vec_out_t)


def test_soak_hybrid_retrieval_under_versioned_refresh(spark, tmp_path):
    """Verdict r14 #7: the round-15 retrieval serving stack composed
    under live ingest — every micro-batch of the vector-ingest stream
    ALSO runs (a) the hybrid RRF query served from the persisted FTS
    index and (b) an ANN serve resolved through the VERSIONED pointer
    layout, while a forced `refresh_ann_index_versioned` promotes a
    new corpus version mid-stream.

    Pinned: pre-swap serves equal the old-corpus batch twin and
    post-swap serves equal the new-corpus twin (same checkpoint,
    stream uninterrupted); the CURRENT pointer flips; a version dir
    resolved BEFORE the swap keeps serving the old results after it
    (the pointer layout's hold-open guarantee — the rename-pair
    refresh cannot make this promise); gc keeps the superseded
    version; and the hybrid results track the corpus the dense side
    serves while remaining equal to their per-corpus batch twins."""
    import wikid_spark.queries.similarity as S
    from wikid_spark.queries.fts import fts_hybrid_rrf_persisted

    SF = "/root/testdata/sf0.001"
    SF2 = "/root/testdata/sf0.01"

    root = str(tmp_path / "ann_root")
    pub0 = S.publish_index_version(spark, SF, root)
    assert pub0["built"] is True

    # batch twins (never-refreshed builds + direct query runs)
    twin_old = str(tmp_path / "tw_old")
    S.persist_ann_index(spark, SF, twin_old)
    twin_new = str(tmp_path / "tw_new")
    S.persist_ann_index(spark, SF2, twin_new)
    want_old = sorted(map(tuple, S.serve_persisted_topk(
        spark, SF, twin_old, nprobe=4).collect()))
    want_new = sorted(map(tuple, S.serve_persisted_topk(
        spark, SF2, twin_new, nprobe=4).collect()))
    assert want_old != want_new
    hyb_old = sorted(map(tuple, fts_hybrid_rrf_persisted(spark, SF).collect()))
    hyb_new = sorted(map(tuple, fts_hybrid_rrf_persisted(spark, SF2).collect()))
    assert hyb_old != hyb_new

    # a reader that resolved the version BEFORE the swap
    pre_swap_dir = S.resolve_current_index(spark, root)

    vidx = str(tmp_path / "vidx")
    corpus = spark.createDataFrame(_corpus_rows(), _SCHEMA.split(", ts")[0])
    vi.persist_vector_index(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"), vidx
    )
    vec_out = str(tmp_path / "vec_verdicts")
    vec_w = vi.vector_verdict_batch_writer(spark, vidx, vec_out)
    serve_sf = {"dir": SF}
    serves: list[tuple[int, list, list]] = []

    def writer(batch, batch_id):
        vec_w(
            batch.select(F.col("doc_id").alias("vec_id"), "embedding"),
            batch_id,
        )
        vdir = S.resolve_current_index(spark, root)
        ann = sorted(map(tuple, S.serve_persisted_topk(
            spark, serve_sf["dir"], vdir, nprobe=4).collect()))
        hyb = sorted(map(tuple, fts_hybrid_rrf_persisted(
            spark, serve_sf["dir"]).collect()))
        serves.append((batch_id, ann, hyb))

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    _write_files(src, _INCOMING[:3], 0)
    _drain(spark, src, ckpt, writer)
    assert [b for b, _, _ in serves] == [0, 1, 2]
    assert all(ann == want_old for _, ann, _ in serves)
    assert all(hyb == hyb_old for _, _, hyb in serves)

    # forced versioned refresh between micro-batches: publish the new
    # corpus's version and flip the pointer (keep=2 retains the old)
    rep = S.refresh_ann_index_versioned(spark, SF2, root, force=True)
    assert rep["refreshed"] is True
    assert S.read_current_version(spark, root) == rep["version"]
    assert rep["version"] != pub0["version"]
    serve_sf["dir"] = SF2

    _write_files(src, _INCOMING[3:], 3)
    _drain(spark, src, ckpt, writer)
    assert [b for b, _, _ in serves] == [0, 1, 2, 3, 4, 5]
    assert all(ann == want_new for _, ann, _ in serves[3:])
    assert all(hyb == hyb_new for _, _, hyb in serves[3:])

    # hold-open guarantee: the pre-swap version dir is untouched and
    # still serves the OLD results after promotion (gc kept it)
    assert os.path.exists(os.path.join(pre_swap_dir, "_INDEX_OK"))
    still_old = sorted(map(tuple, S.serve_persisted_topk(
        spark, SF, pre_swap_dir, nprobe=4).collect()))
    assert still_old == want_old


def test_soak_fts_index_follows_dedup_keeps(spark, tmp_path):
    """Round 15: the evolving FTS index composed DOWNSTREAM of the LSH
    dedup verdicts in one foreachBatch — only kept documents are
    indexed (the fts_index_batch_writer docstring's composition
    contract). Mid-stream, a crash is injected between compaction's
    two renames on the postings component and healed by re-running
    compaction. Authoritative assertion: BM25 served from the evolving
    index equals a from-scratch rebuild over exactly (corpus + kept
    incoming docs); spot-checked against the documented keep set."""
    from wikid_spark.operators.fts import bm25_from_docs
    from wikid_spark.streaming import fts_ingest as FI

    corpus = spark.createDataFrame(_corpus_rows(), _SCHEMA.split(", ts")[0])
    docs = corpus.select("doc_id", "text")

    lsh_idx = str(tmp_path / "lsh_idx")
    dedup_ingest.persist_dedup_index(docs, lsh_idx)
    fts_idx = str(tmp_path / "fts_idx")
    FI.persist_streaming_fts_index(docs, fts_idx)

    lsh_out = str(tmp_path / "lsh_verdicts")
    lsh_w = dedup_ingest.dedup_verdict_batch_writer(spark, lsh_idx, lsh_out)
    fts_w = FI.fts_index_batch_writer(spark, fts_idx)

    def writer(batch, batch_id):
        lsh_w(batch.select("doc_id", "text"), batch_id)
        kept = (
            dedup_ingest.read_verdicts(spark, lsh_out)
            .filter(F.col("verdict") == "keep")
            .select("doc_id")
        )
        fts_w(
            batch.select("doc_id", "text").join(
                F.broadcast(kept), "doc_id", "left_semi"
            ),
            batch_id,
        )

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    _write_files(src, _INCOMING[:3], 0)
    _drain(spark, src, ckpt, writer)

    # crash between compaction's two renames on the postings part
    os.rename(f"{fts_idx}/postings", f"{fts_idx}/postings.old")
    FI.compact_streaming_fts_index(spark, fts_idx)
    for part in ("postings", "termstats", "stats"):
        kids = os.listdir(f"{fts_idx}/{part}")
        assert [k for k in kids if k.startswith("batch_id=")] == ["batch_id=-1"]

    _write_files(src, _INCOMING[3:], 3)
    _drain(spark, src, ckpt, writer)

    kept_ids = {
        r["doc_id"]
        for r in dedup_ingest.read_verdicts(spark, lsh_out)
        .filter(F.col("verdict") == "keep")
        .collect()
    }
    assert kept_ids == {100, 101, 104}  # documented LSH keep set

    terms = ["quantum", "gravel"]
    incoming = spark.createDataFrame(_INCOMING, _SCHEMA).select(
        "doc_id", "text"
    )
    want_docs = docs.unionByName(
        incoming.filter(F.col("doc_id").isin(sorted(kept_ids)))
    )
    want = {
        r["doc"]: r["score"]
        for r in bm25_from_docs(want_docs, "doc_id", "text", terms)
        .select("doc", F.round("score", 4).alias("score"))
        .collect()
    }
    got = {
        r["doc"]: r["score"]
        for r in FI.bm25_streaming(spark, fts_idx, terms)
        .select("doc", F.round("score", 4).alias("score"))
        .collect()
    }
    assert got == want
    assert 100 in got and 101 in got  # kept docs searchable
    assert 102 not in got and 103 not in got  # dropped docs are not


def test_soak_drift_refresh_follows_growing_corpus(spark, tmp_path):
    """VERDICT r15 #3, the Done criterion: a vector-ingest stream GROWS
    the serving corpus past a derived-K boundary mid-stream, and the
    `drift_refresh_writer` foreachBatch hook notices from the cheap
    signal ladder alone (footer rowcount — no corpus scan on the
    trigger path), promotes the re-derived build under the
    single-writer lease, and the in-stream serves swap atomically:
    every serve equals the batch twin of whichever corpus generation
    the CURRENT pointer names — old build before the boundary batch,
    new build from the boundary batch on, never a torn mix."""
    import json as _json

    import wikid_spark.queries.similarity as S

    SF = "/root/testdata/sf0.001"
    corp = str(tmp_path / "corp")
    os.makedirs(corp)
    base = S.table(spark, SF, "embeddings").orderBy("vec_id").limit(110)
    base.coalesce(1).write.parquet(f"{corp}/embeddings.parquet")
    grow_rows = [
        (int(r["vec_id"]) + 100_000, [float(x) for x in r["embedding"]])
        for r in S.table(spark, SF, "embeddings")
        .orderBy("vec_id")
        .limit(145)
        .orderBy(F.desc("vec_id"))
        .limit(35)
        .collect()
    ]

    root = str(tmp_path / "root")
    rep0 = S.maybe_refresh_index(spark, corp, root)
    assert rep0["trigger"] == "bootstrap"

    # batch twin of the PRE-growth generation, materialized now (the
    # corpus dir mutates mid-stream)
    twin_old = str(tmp_path / "twin_old")
    S.persist_ann_index(spark, corp, twin_old)
    want_old = sorted(
        map(tuple, S.serve_persisted_topk(spark, corp, twin_old).collect())
    )

    def append_writer(batch, batch_id):
        rows = batch.filter(F.col("vec_id") >= 0)
        if rows.count():
            rows.coalesce(1).write.mode("append").parquet(
                f"{corp}/embeddings.parquet"
            )

    serves: list[tuple[int, str, str, list]] = []

    def on_report(batch_id, rep):
        vdir = S.resolve_current_index(spark, root)
        assert os.path.exists(os.path.join(vdir, "_INDEX_OK"))  # atomic
        got = sorted(
            map(tuple, S.serve_persisted_topk(spark, corp, vdir).collect())
        )
        serves.append((batch_id, rep["trigger"], rep["version"], got))

    writer = S.drift_refresh_writer(
        append_writer, spark, corp, root, on_report=on_report
    )

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    now = time.time()
    specs = [
        [{"vec_id": -1, "embedding": [0.0] * 64}],          # batch 0: serve only
        [{"vec_id": v, "embedding": e} for v, e in grow_rows],  # batch 1: cross K
        [{"vec_id": -2, "embedding": [0.0] * 64}],          # batch 2: serve only
    ]
    for i, rows in enumerate(specs):
        p = f"{src}/g{i}.json"
        with open(p, "w") as fh:
            for row in rows:
                fh.write(_json.dumps(row) + "\n")
        os.utime(p, (now - 300 + 10 * i, now - 300 + 10 * i))
    q = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # batch twin of the POST-growth generation
    twin_new = str(tmp_path / "twin_new")
    S.persist_ann_index(spark, corp, twin_new)
    want_new = sorted(
        map(tuple, S.serve_persisted_topk(spark, corp, twin_new).collect())
    )
    assert want_old != want_new  # the swap is observable

    assert [(b, t) for b, t, _, _ in serves] == [
        (0, "current"), (1, "k_boundary"), (2, "current")
    ]
    v0, v1, v2 = (v for _, _, v, _ in serves)
    assert v0 == rep0["version"] and v1 == v2 != v0  # flipped exactly once
    assert serves[0][3] == want_old
    assert serves[1][3] == want_new and serves[2][3] == want_new
    # re-derived K landed in the promoted build
    cents = spark.read.parquet(f"{root}/versions/{v1}/centroids")
    assert cents.count() == S.derived_k(145) == 13
    # lease released after promotion; old generation held open for
    # in-flight serves (gc keep=2)
    assert not os.path.exists(f"{root}/.refresh_lock/_WRITER_LEASE")
    assert os.path.exists(f"{root}/versions/{v0}/_INDEX_OK")
    still_old = sorted(
        map(
            tuple,
            S.serve_persisted_topk(
                spark, corp, f"{root}/versions/{v0}"
            ).collect(),
        )
    )
    # the held-open old build serves the OLD index over today's queries
    assert still_old != want_new


def test_soak_full_pipeline_three_indexes(spark, tmp_path):
    """VERDICT r15 #4 — the production shape composed in ONE
    foreachBatch: a document+embedding stream feeds LSH dedup verdicts;
    kept docs flow into the evolving FTS index AND the evolving vector
    index; hybrid RRF (lexical BM25 + exact dense cosine) is served
    mid-stream from BOTH indexes after every micro-batch, with one
    crash injected mid-compaction (between the two renames, on both
    indexes at once) and healed. Authoritative assertion: the served
    hybrid at EVERY checkpoint equals the from-scratch hybrid over
    exactly (corpus + kept incoming docs through that batch) — the
    batch rebuild twin — and compaction changes nothing observable."""
    from wikid_spark.functions.vectors import cosine_similarity
    from wikid_spark.operators.fts import bm25_from_docs
    from wikid_spark.queries.fts import rrf_fuse_frames
    from wikid_spark.streaming import fts_ingest as FI, hybrid as HY

    corpus = spark.createDataFrame(_corpus_rows(), _SCHEMA.split(", ts")[0])
    docs = corpus.select("doc_id", "text")
    vecs = corpus.select(F.col("doc_id").alias("vec_id"), "embedding")

    lsh_idx = str(tmp_path / "lsh_idx")
    dedup_ingest.persist_dedup_index(docs, lsh_idx)
    fts_idx = str(tmp_path / "fts_idx")
    FI.persist_streaming_fts_index(docs, fts_idx)
    vidx = str(tmp_path / "vidx")
    vi.persist_vector_index(vecs, vidx)

    lsh_out = str(tmp_path / "lsh_verdicts")
    lsh_w = dedup_ingest.dedup_verdict_batch_writer(spark, lsh_idx, lsh_out)
    fts_w = FI.fts_index_batch_writer(spark, fts_idx)

    TERMS = ["quantum", "gravel", "oak"]
    QID = 1  # corpus member: its vector is IN the evolving index
    serves: list[tuple[int, list]] = []

    def writer(batch, batch_id):
        b = batch.localCheckpoint(eager=True)
        lsh_w(b.select("doc_id", "text"), batch_id)
        kept = (
            dedup_ingest.read_verdicts(spark, lsh_out)
            .filter(F.col("verdict") == "keep")
            .select("doc_id")
        )
        fts_w(
            b.select("doc_id", "text").join(
                F.broadcast(kept), "doc_id", "left_semi"
            ),
            batch_id,
        )
        vi.append_kept_to_vector_index(
            b.select(F.col("doc_id").alias("vec_id"), "embedding"),
            kept.withColumnRenamed("doc_id", "vec_id"),
            vidx,
            batch_id,
        )
        got = sorted(
            map(
                tuple,
                HY.hybrid_rrf_streaming(
                    spark, fts_idx, vidx, TERMS, QID
                ).collect(),
            )
        )
        serves.append((batch_id, got))

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    _write_files(src, _INCOMING[:3], 0)
    _drain(spark, src, ckpt, writer)

    # one crash, injected between compaction's two renames on BOTH
    # indexes at once, healed by re-running the compactions
    os.rename(f"{fts_idx}/postings", f"{fts_idx}/postings.old")
    os.rename(f"{vidx}/cells", f"{vidx}/cells.old")
    FI.compact_streaming_fts_index(spark, fts_idx)
    vi.compact_vector_index(spark, vidx)
    for d, part in ((fts_idx, "postings"), (fts_idx, "termstats"),
                    (fts_idx, "stats"), (vidx, "cells")):
        kids = [k for k in os.listdir(f"{d}/{part}") if k.startswith("batch_id=")]
        assert kids == ["batch_id=-1"], (d, part, kids)
    # compaction is invisible to serving: re-serve checkpoint 2
    post_compact = sorted(
        map(
            tuple,
            HY.hybrid_rrf_streaming(spark, fts_idx, vidx, TERMS, QID).collect(),
        )
    )
    assert post_compact == serves[2][1]

    _write_files(src, _INCOMING[3:], 3)
    _drain(spark, src, ckpt, writer)
    assert [b for b, _ in serves] == [0, 1, 2, 3, 4, 5]

    # the stream's LSH keep set is the documented one (the twins below
    # are computed from it INDEPENDENTLY of the stream's own state)
    kept_ids = {
        r["doc_id"]
        for r in dedup_ingest.read_verdicts(spark, lsh_out)
        .filter(F.col("verdict") == "keep")
        .collect()
    }
    assert kept_ids == {100, 101, 104}

    incoming = spark.createDataFrame(_INCOMING, _SCHEMA)
    for bid, got in serves:
        arrived_kept = [
            d for d in (100, 101, 102, 103, 104, 105)
            if d <= 100 + bid and d in kept_ids
        ]
        extra = incoming.filter(F.col("doc_id").isin(arrived_kept or [-1]))
        docs_b = docs.unionByName(extra.select("doc_id", "text"))
        vecs_b = vecs.unionByName(
            extra.select(F.col("doc_id").alias("vec_id"), "embedding")
        )
        bm = bm25_from_docs(docs_b, "doc_id", "text", TERMS).select(
            "doc", F.round("score", 4).alias("score")
        )
        qv = vecs_b.filter(F.col("vec_id") == QID).select(
            F.col("embedding").alias("qe")
        )
        ds = (
            vecs_b.filter(F.col("vec_id") != QID)
            .crossJoin(F.broadcast(qv))
            .select(
                F.col("vec_id").alias("doc"),
                F.round(
                    cosine_similarity(F.col("embedding"), F.col("qe")), 4
                ).alias("sim"),
            )
        )
        want = sorted(map(tuple, rrf_fuse_frames(bm, ds).collect()))
        assert got == want, f"checkpoint {bid}"
        # the hybrid actually tracks the evolving state: kept incoming
        # docs become retrievable on the dense side once indexed
        if 100 in arrived_kept:
            assert any(r[0] == 100 for r in got), f"checkpoint {bid}"
