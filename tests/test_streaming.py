"""Streaming layer tests: batch-twin equivalence + ingest idempotency.

Strategy (SURVEY.md §5.5): every streaming operator also runs in batch
mode, where semantics are exact — the streaming run over a file source
drained with availableNow must produce the same rows. Watermark
late-data *dropping* is wall-clock sensitive and is exercised only
behaviorally (state bounded, query progresses), not oracle-hashed.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from wikid_spark.catalog import table
from wikid_spark.streaming import ingest
from wikid_spark.streaming.windows import (
    dedup_within_watermark,
    interval_attribution_join,
    session_stats,
    sliding_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return table(spark, SF, "events").cache()


@pytest.fixture(scope="module")
def events_stream_dir(spark, events_batch, tmp_path_factory):
    """Events re-written as a 3-file json stream source directory."""
    d = tmp_path_factory.mktemp("events_stream")
    (
        # microsecond precision: session boundaries depend on exact ts
        events_batch.withColumn(
            "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        )
        .repartition(3)
        .write.mode("overwrite")
        .json(str(d / "src"))
    )
    return str(d / "src")


def _stream(spark, events_stream_dir, events_batch):
    schema = (
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .json(events_stream_dir)
        .withColumn("ts", F.to_timestamp("ts"))
    )


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_tumbling_stream_equals_batch(spark, events_batch, events_stream_dir):
    stream = _stream(spark, events_stream_dir, events_batch)
    name = _drain(tumbling_counts(stream), "t_tumbling")
    got = _sorted_rows(spark.table(name))
    want = _sorted_rows(tumbling_counts(events_batch))
    assert got == want and len(got) > 0


def test_sliding_stream_equals_batch(spark, events_batch, events_stream_dir):
    stream = _stream(spark, events_stream_dir, events_batch)
    name = _drain(sliding_counts(stream), "t_sliding")
    got = _sorted_rows(spark.table(name))
    want = _sorted_rows(sliding_counts(events_batch))
    assert got == want and len(got) > 0
    # each event lands in window/slide = 4 overlapping windows
    n_tumbling = spark.table("t_tumbling").agg(F.sum("n_events")).first()[0]
    n_sliding = spark.table(name).agg(F.sum("n_events")).first()[0]
    assert n_sliding == 4 * n_tumbling


def test_session_stream_equals_batch_and_q23(spark, events_batch, events_stream_dir):
    stream = _stream(spark, events_stream_dir, events_batch)
    # Files arrive in arbitrary order across micro-batches, so a tight
    # watermark would (correctly) drop late rows; equivalence with the
    # batch twin needs the watermark out of the picture — what's under
    # test is gap-merge across micro-batches.
    name = _drain(session_stats(stream, watermark="365 days"), "t_session")
    got = _sorted_rows(spark.table(name))
    want = _sorted_rows(session_stats(events_batch))
    assert got == want and len(got) > 0
    # Batch twin of Q23: session COUNT per user from session_window ==
    # the gaps-and-islands formulation (new session when gap > 30 min).
    from wikid_spark.registry import get

    q23 = {
        (r["user_id"]): r["n_sessions"]
        for r in get("q23_sessionization").fn(spark, SF).collect()
    }
    sess_counts = {
        r["user_id"]: r["n"]
        for r in session_stats(events_batch)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sess_counts == q23


def test_streaming_dedup(spark, events_batch, events_stream_dir, tmp_path):
    # duplicate the source dir content → exact duplicates across batches
    dup = _stream(spark, events_stream_dir, events_batch)
    deduped = dedup_within_watermark(dup, ["event_id"], watermark="365 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.table("t_dedup").count()
    assert n == events_batch.select("event_id").distinct().count()


def test_ingest_exactly_once_merge(spark, tmp_path):
    """foreachBatch merge sink: totals equal the direct aggregate, and
    re-running the drained stream (same checkpoint) changes nothing —
    the reference's J5 restart-idempotency contract."""
    src = tmp_path / "src"
    src.mkdir()
    rows1 = [("NYC", "Q60", 1), ("NYC", "Q60", 1), ("Big Apple", "Q60", 1)]
    rows2 = [("NYC", "Q60", 3), ("Boston", "Q100", 2)]
    for i, rows in enumerate([rows1, rows2]):
        with open(src / f"part{i}.json", "w") as f:
            for a, e, c in rows:
                f.write(json.dumps({"alias": a, "entity_id": e, "count": c}) + "\n")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("alias string, entity_id string, count bigint")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = ingest.start_alias_count_ingest(stream, target, ckpt)
    q.awaitTermination(120)
    merged = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in ingest.read_alias_counts(spark, target).collect()
    }
    assert merged == {("NYC", "Q60"): 5, ("Big Apple", "Q60"): 1, ("Boston", "Q100"): 2}
    # restart with same checkpoint: no new input → no change
    stream2 = (
        spark.readStream.schema("alias string, entity_id string, count bigint")
        .json(str(src))
    )
    q2 = ingest.start_alias_count_ingest(stream2, target, ckpt)
    q2.awaitTermination(120)
    merged2 = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in ingest.read_alias_counts(spark, target).collect()
    }
    assert merged2 == merged


def test_stream_stream_interval_join_equals_batch(
    spark, events_batch, events_stream_dir, tmp_path
):
    """St7 stream-stream join: click→purchase attribution over two
    streaming sides must equal the batch twin. The test watermark (60
    days) EXCEEDS the fixture's 30-day event span, so no row can be
    dropped as late regardless of how repartition(3) shuffled events
    across the stream files (a 1-day watermark flaked ~1/6: a batch
    whose max event time led a later file's rows by more than the
    delay silently dropped them). Equality is then exact for an inner
    join; production shrinks the watermark to bound state."""
    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    bc, bp = split(events_batch)
    expected = {
        tuple(r)
        for r in interval_attribution_join(bc, bp, watermark="60 days").collect()
    }
    assert expected, "fixture should produce attributable pairs"

    sc_, sp = split(_stream(spark, events_stream_dir, events_batch))
    out = str(tmp_path / "attrib_out")
    q = (
        interval_attribution_join(sc_, sp, watermark="60 days")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "attrib_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow drain did not finish"
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_keyed_merge_equals_batch_reaggregation(spark, tmp_path):
    """MERGE-by-rewrite sink: sequentially merging N update batches must
    equal one-shot aggregation of their union (the q08 associative-SUM
    invariant), and re-merging a batch through the ledgered foreachBatch
    writer must change nothing (replay idempotency)."""
    import pyspark.sql.functions as F

    events = table(spark, SF, "events")
    updates = events.select(
        F.col("event_type").alias("alias"),
        (F.col("user_id") % 10).cast("string").alias("entity_id"),
        F.lit(1).cast("bigint").alias("count"),
    )
    target = str(tmp_path / "merge_target")
    # deterministic batch split: a bare limit() without ORDER BY may
    # pick different rows when the plan re-executes for the oneshot
    batches = [updates.filter(F.col("alias") != "click"),
               updates.filter(F.col("alias") == "click"),
               updates.filter(F.col("entity_id").cast("int") % 3 == 0)]
    for b in batches:
        ingest.merge_alias_counts(spark, target, b)
    oneshot = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in batches[0].unionByName(batches[1]).unionByName(batches[2])
        .groupBy("alias", "entity_id").agg(F.sum("count").alias("count"))
        .collect()
    }
    merged = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in spark.read.parquet(target)
        .select("alias", "entity_id", "count").collect()
    }
    assert merged == oneshot

    # dynamic overwrite only rewrites affected buckets: merging a batch
    # touching ONE alias must leave every other key untouched
    ingest.merge_alias_counts(
        spark,
        target,
        spark.createDataFrame(
            [("click", "0", 7)], "alias string, entity_id string, count bigint"
        ),
    )
    after = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in spark.read.parquet(target)
        .select("alias", "entity_id", "count").collect()
    }
    assert after[("click", "0")] == oneshot[("click", "0")] + 7
    assert {k: v for k, v in after.items() if k != ("click", "0")} == {
        k: v for k, v in oneshot.items() if k != ("click", "0")
    }

    # ledgered writer: a replayed batch_id is a no-op
    writer = ingest.merge_upsert_batch_writer(spark, target)
    replay = spark.createDataFrame(
        [("click", "0", 100)], "alias string, entity_id string, count bigint"
    )
    writer(replay, 999)
    once = spark.read.parquet(target).filter(
        (F.col("alias") == "click") & (F.col("entity_id") == "0")
    ).collect()[0]["count"]
    writer(replay, 999)  # same batch_id → skipped
    twice = spark.read.parquet(target).filter(
        (F.col("alias") == "click") & (F.col("entity_id") == "0")
    ).collect()[0]["count"]
    assert once == twice == after[("click", "0")] + 100


def test_stateful_running_stats_stream_equals_batch(
    spark, events_batch, events_stream_dir
):
    """applyInPandasWithState: per-user running totals accumulated across
    micro-batches must end at the batch groupBy answer (update mode emits
    one row per touched user per batch; the LAST emission is the total)."""
    from wikid_spark.streaming.stateful import running_user_stats

    stream = _stream(spark, events_stream_dir, events_batch)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("t_stateful")
    # multiple emissions per user (one per micro-batch that touched it);
    # the final state per user is the row with the max running count
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    got = sorted(
        (r["user_id"], r["n_events"], round(r["total_value"], 4))
        for r in final.collect()
    )
    want = sorted(
        (r["user_id"], r["n_events"], round(r["total_value"], 4))
        for r in running_user_stats(events_batch).collect()
    )
    assert got == want and len(got) > 0
    # state genuinely crossed batches: stream had 3 files → some user must
    # have emitted more than one distinct running count
    multi = emitted.groupBy("user_id").count().filter("count > 1").count()
    assert multi > 0


def test_keyed_merge_crash_between_merge_and_marker_is_safe(spark, tmp_path):
    """The failure the naive ledger misses: a crash AFTER the merge
    started mutating the table but BEFORE the done-marker landed. With
    stage-and-promote, a replay after a crash mid-PROMOTION must resume
    promotion from the staged (already-computed) state instead of
    re-merging against the half-promoted table — applying the batch
    exactly once."""
    import shutil as _shutil

    import pyspark.sql.functions as F

    from wikid_spark.streaming import ingest

    target = str(tmp_path / "merge_target")
    base = spark.createDataFrame(
        [("NYC", "Q60", 5), ("Boston", "Q100", 2), ("LA", "Q65", 4)],
        "alias string, entity_id string, count bigint",
    )
    ingest.merge_alias_counts(spark, target, base)
    writer = ingest.merge_upsert_batch_writer(spark, target)
    batch = spark.createDataFrame(
        [("NYC", "Q60", 1), ("Boston", "Q100", 1), ("LA", "Q65", 1)],
        "alias string, entity_id string, count bigint",
    )

    # crash after the FIRST bucket directory is promoted
    real_copytree = _shutil.copytree
    state = {"copies": 0}

    def crashing_copytree(src, dst, **kw):
        if state["copies"] >= 1:
            raise RuntimeError("simulated crash mid-promotion")
        state["copies"] += 1
        return real_copytree(src, dst, **kw)

    _shutil.copytree = crashing_copytree
    try:
        with pytest.raises(RuntimeError):
            writer(batch, 42)
    finally:
        _shutil.copytree = real_copytree

    # replay: must resume from staging, not re-merge → exactly-once
    writer(batch, 42)
    got = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in spark.read.parquet(target)
        .select("alias", "entity_id", "count").collect()
    }
    assert got == {("NYC", "Q60"): 6, ("Boston", "Q100"): 3, ("LA", "Q65"): 5}
    # and a THIRD delivery after success is a clean no-op
    writer(batch, 42)
    again = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in spark.read.parquet(target)
        .select("alias", "entity_id", "count").collect()
    }
    assert again == got


def test_keyed_merge_single_writer_lease(spark, tmp_path):
    """Verdict ask: multi-writer isolation. A second LIVE writer must be
    rejected (ConcurrentWriterError) instead of interleaving bucket
    promotions; after the holder's lease expires (crash), a successor
    takes over cleanly."""
    import os
    import time as _time

    from wikid_spark.streaming import ingest

    target = str(tmp_path / "merge_target")
    batch = spark.createDataFrame(
        [("NYC", "Q60", 1)], "alias string, entity_id string, count bigint"
    )
    a = ingest.merge_upsert_batch_writer(spark, target, writer_id="writer-a")
    a(batch, 0)

    # a different live writer is refused
    b = ingest.merge_upsert_batch_writer(spark, target, writer_id="writer-b")
    with pytest.raises(ingest.ConcurrentWriterError):
        b(batch, 1)

    # the holder keeps working (heartbeat renewal)
    a(batch, 1)

    # holder crashes: age the lease past expiry → successor takes over
    lease = os.path.join(target, ingest.LEASE_FILE)
    old = _time.time() - 10_000
    os.utime(lease, (old, old))
    b(batch, 2)
    got = {
        (r["alias"], r["entity_id"]): r["count"]
        for r in spark.read.parquet(target)
        .select("alias", "entity_id", "count").collect()
    }
    assert got == {("NYC", "Q60"): 3}
    with open(lease) as f:
        assert f.read().strip() == "writer-b"


def test_streaming_incremental_dedup_against_persisted_index(
    spark, tmp_path
):
    """Streaming twin of nd_incremental_dedup: the corpus LSH index is
    built ONCE and persisted; new documents arrive as a 3-file stream
    and each micro-batch probes the index via foreachBatch. The union
    of streamed verdicts must equal the batch query's verdicts on the
    same corpus/batch partition — same signature math by construction
    (shared band_table_from / shingles_from), certified here
    end-to-end. A replayed batch_id must overwrite, not duplicate."""
    from wikid_spark.queries.dedup import nd_incremental_dedup
    from wikid_spark.streaming import dedup_ingest

    docs = table(spark, SF, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new_docs = docs.filter(F.col("doc_id") % 10 == 0)

    index_dir = str(tmp_path / "lsh_index")
    dedup_ingest.persist_dedup_index(corpus, index_dir)

    src = str(tmp_path / "incoming")
    new_docs.repartition(3).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out_dir = str(tmp_path / "verdicts")
    q = (
        stream.writeStream.foreachBatch(
            # evolve=False: this test certifies the STATIC-index mode,
            # whose semantics are exactly the registered batch query
            dedup_ingest.dedup_verdict_batch_writer(
                spark, index_dir, out_dir, evolve=False
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        map(tuple, dedup_ingest.read_verdicts(spark, out_dir).collect())
    )
    want = sorted(map(tuple, nd_incremental_dedup(spark, SF).collect()))
    assert got == want and len(got) > 0

    # replay idempotency: delivering the same batch twice overwrites
    # its own output — row set unchanged, no duplicates
    out2 = str(tmp_path / "verdicts_replay")
    writer = dedup_ingest.dedup_verdict_batch_writer(spark, index_dir, out2)
    # deterministic replay batch: an unordered limit() may pick
    # different rows on each of the two writer calls
    replay = new_docs.orderBy("doc_id").limit(20)
    writer(replay, 0)
    once = sorted(
        map(tuple, dedup_ingest.read_verdicts(spark, out2).collect())
    )
    writer(replay, 0)
    twice = sorted(
        map(tuple, dedup_ingest.read_verdicts(spark, out2).collect())
    )
    assert once == twice and len(once) == 20


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


_CORPUS_ROWS = [
    (1, "oak maple birch cedar willow pine elm ash fir spruce"),
    (2, "red orange yellow green blue indigo violet purple pink teal"),
]
_DOC_A = "quantum entanglement allows correlated measurement outcomes across distance boundaries today"
_DOC_A_NEARDUP = "quantum entanglement allows correlated measurement outcomes across distance boundaries tomorrow"
_DOC_UNRELATED = "gravel cement asphalt concrete mortar brick tile slate plaster stone"


def test_evolving_index_catches_cross_batch_neardups(spark, tmp_path):
    """The read-your-own-writes contract: doc A arrives (and is kept)
    in batch 0; a near-dup of A — matching NOTHING in the original
    corpus — arrives in batch 1 and must get 'drop' with dup_of = A,
    because batch 0's kept signatures were appended to the index.
    Replaying batch 1 yields identical verdicts (its probe reads
    strictly batch_id < 1, so its own appends are invisible), and the
    verdicts equal a fresh static probe against corpus ∪ batch-0-kept
    (the batch-twin definition of the evolving semantics)."""
    from wikid_spark.streaming import dedup_ingest

    corpus = _mkdocs(spark, _CORPUS_ROWS)
    index_dir = str(tmp_path / "idx")
    dedup_ingest.persist_dedup_index(corpus, index_dir)

    out_dir = str(tmp_path / "verdicts")
    writer = dedup_ingest.dedup_verdict_batch_writer(spark, index_dir, out_dir)
    b0 = _mkdocs(spark, [(100, _DOC_A)])
    b1 = _mkdocs(spark, [(200, _DOC_A_NEARDUP), (201, _DOC_UNRELATED)])
    writer(b0, 0)
    writer(b1, 1)

    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in dedup_ingest.read_verdicts(spark, out_dir).collect()
    }
    assert got[100] == ("keep", None)
    assert got[200] == ("drop", 100)  # cross-batch near-dup caught
    assert got[201] == ("keep", None)

    # replay idempotency including the index appends
    before = sorted(
        map(tuple, dedup_ingest.read_verdicts(spark, out_dir).collect())
    )
    writer(b1, 1)
    after = sorted(
        map(tuple, dedup_ingest.read_verdicts(spark, out_dir).collect())
    )
    assert before == after

    # batch-twin equality: evolving verdicts for batch 1 == static
    # verdicts against corpus ∪ earlier kept docs
    twin_dir = str(tmp_path / "twin_idx")
    dedup_ingest.persist_dedup_index(
        corpus.unionByName(b0), twin_dir
    )
    want = sorted(
        map(tuple, dedup_ingest.batch_verdicts(spark, b1, twin_dir).collect())
    )
    got1 = sorted(
        map(
            tuple,
            spark.read.parquet(f"{out_dir}/batch_id=1")
            .select("doc_id", "dup_of", "jaccard", "verdict")
            .collect(),
        )
    )
    assert got1 == want

    # compaction folds deltas into the base without changing probes
    dedup_ingest.compact_dedup_index(spark, index_dir)
    b2 = _mkdocs(spark, [(300, _DOC_A + " entirely")])
    v2 = {
        r["doc_id"]: r["verdict"]
        for r in dedup_ingest.batch_verdicts(spark, b2, index_dir).collect()
    }
    assert v2[300] == "drop"  # still sees doc 100 post-compaction

    # self-match guard: after compaction the base holds batch 1's OWN
    # kept doc (201) under batch_id=-1, so a replay of batch 1 probes
    # an index containing itself — without the old_id != new_id guard
    # it would self-match at jaccard 1.0 and flip to 'drop'
    writer(b1, 1)
    replayed = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in spark.read.parquet(f"{out_dir}/batch_id=1").collect()
    }
    assert replayed[201] == ("keep", None)
    assert replayed[200] == ("drop", 100)


def test_evolving_index_through_stream(spark, tmp_path):
    """End-to-end through a real file-source stream: the near-dup pair
    spans two micro-batches (one file per trigger, mtime-ordered), so
    exactly one of the pair survives and the other names it dup_of."""
    import os
    import time

    from wikid_spark.streaming import dedup_ingest

    corpus = _mkdocs(spark, _CORPUS_ROWS)
    index_dir = str(tmp_path / "idx")
    dedup_ingest.persist_dedup_index(corpus, index_dir)

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    with open(f"{src}/f0.json", "w") as f:
        f.write(json.dumps({"doc_id": 100, "text": _DOC_A}) + "\n")
    with open(f"{src}/f1.json", "w") as f:
        f.write(json.dumps({"doc_id": 200, "text": _DOC_A_NEARDUP}) + "\n")
    now = time.time()
    os.utime(f"{src}/f0.json", (now - 60, now - 60))  # f0 strictly older

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out_dir = str(tmp_path / "verdicts")
    q = (
        stream.writeStream.foreachBatch(
            dedup_ingest.dedup_verdict_batch_writer(spark, index_dir, out_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in dedup_ingest.read_verdicts(spark, out_dir).collect()
    }
    assert len(got) == 2
    verdicts = sorted(v for v, _ in got.values())
    assert verdicts == ["drop", "keep"]  # one of the pair survives
    dropped = next(d for d, (v, _) in got.items() if v == "drop")
    kept = next(d for d, (v, _) in got.items() if v == "keep")
    assert got[dropped][1] == kept  # and names the survivor


def test_compaction_heals_crash_between_renames(spark, tmp_path):
    """Round-7 regression: `compact_dedup_index` swaps the folded base
    in with two renames — rename(live, old) then rename(tmp, live). A
    crash in the instant between them leaves NO live tree; the pre-r7
    code then unconditionally rmtree'd both `.old` and `.compacting`,
    destroying every surviving copy. Simulate each crash state and
    assert a re-run restores a correct, probe-able index.

    State A: live missing, `.old` present (+ a stale incomplete tmp) →
    heal from `.old` (it WAS the live tree)."""
    import os
    import shutil

    from wikid_spark.streaming import dedup_ingest

    corpus = _mkdocs(spark, _CORPUS_ROWS + [(3, _DOC_A)])
    index_dir = str(tmp_path / "idx")
    dedup_ingest.persist_dedup_index(corpus, index_dir)

    def probe_verdict():
        b = _mkdocs(spark, [(900, _DOC_A_NEARDUP)])
        rows = dedup_ingest.batch_verdicts(spark, b, index_dir).collect()
        return {r["doc_id"]: (r["verdict"], r["dup_of"]) for r in rows}

    baseline = probe_verdict()
    assert baseline[900] == ("drop", 3)

    # Crash state A for the 'bands' component: mid-swap, old holds the
    # only complete copy; tmp exists but is torn (no _SUCCESS).
    live = f"{index_dir}/bands"
    os.rename(live, f"{live}.old")
    os.makedirs(f"{live}.compacting/batch_id=-1")  # torn: no _SUCCESS
    dedup_ingest.compact_dedup_index(spark, index_dir)
    assert not os.path.exists(f"{live}.old")
    assert not os.path.exists(f"{live}.compacting")
    assert probe_verdict() == baseline

    # Crash state B: old already cleaned up, tmp is COMPLETE (_SUCCESS
    # present) — the crash hit after rename(live, old) and after the
    # fold finished writing but before rename(tmp, live)... i.e. the
    # re-run must adopt the complete tmp as live.
    shutil.move(live, f"{live}.compacting")
    assert os.path.exists(f"{live}.compacting/batch_id=-1/_SUCCESS")
    dedup_ingest.compact_dedup_index(spark, index_dir)
    assert probe_verdict() == baseline

    # Crash state C: nothing restorable → loud failure, no deletion of
    # the other components.
    shutil.rmtree(live)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="bands"):
        dedup_ingest.compact_dedup_index(spark, index_dir)
    assert os.path.exists(f"{index_dir}/shingles")  # untouched


def test_compaction_heals_with_appended_deltas(spark, tmp_path):
    """Healing composes with the evolving-index contract: corpus base
    plus a batch-0 delta, crash mid-swap on `shingles`, re-run, and
    the compacted index still catches a near-dup of the DELTA doc."""
    import os

    from wikid_spark.streaming import dedup_ingest

    corpus = _mkdocs(spark, _CORPUS_ROWS)
    index_dir = str(tmp_path / "idx")
    dedup_ingest.persist_dedup_index(corpus, index_dir)
    kept = _mkdocs(spark, [(100, _DOC_A)])
    kept_ids = kept.select("doc_id")
    dedup_ingest.append_kept_to_index(kept, kept_ids, index_dir, 0)

    live = f"{index_dir}/shingles"
    os.rename(live, f"{live}.old")  # crash between the two renames
    dedup_ingest.compact_dedup_index(spark, index_dir)

    b = _mkdocs(spark, [(901, _DOC_A_NEARDUP)])
    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in dedup_ingest.batch_verdicts(spark, b, index_dir).collect()
    }
    assert got[901] == ("drop", 100)
    # Deltas folded: only the base partition remains.
    for part in ("bands", "shingles", "sizes"):
        kids = os.listdir(f"{index_dir}/{part}")
        assert [k for k in kids if k.startswith("batch_id=")] == [
            "batch_id=-1"
        ]


def test_lsm_cycle_append_compact_bucketed_probe(spark, tmp_path):
    """The full LSM cycle as one tested path: stream-append deltas to
    the path-partitioned index -> compact -> publish the folded base
    as the bucketed catalog tables -> probe. The bucketed probe must
    (a) return verdicts identical to the path-partitioned probe on
    the same index state — including a near-dup of a DELTA doc, so
    the fold provably carried the appends into the serving layout —
    and (b) bucket-prune every index scan (SelectedBucketsCount <
    total) post-compaction."""
    import contextlib
    import io
    import os
    import re

    from wikid_spark.streaming import dedup_ingest

    corpus = _mkdocs(spark, _CORPUS_ROWS)
    index_dir = str(tmp_path / "idx")
    dedup_ingest.persist_dedup_index(corpus, index_dir)

    # two streamed batches; batch 0's kept doc is the cross-batch bait
    out_dir = str(tmp_path / "verdicts")
    writer = dedup_ingest.dedup_verdict_batch_writer(
        spark, index_dir, out_dir
    )
    writer(_mkdocs(spark, [(100, _DOC_A)]), 0)
    writer(_mkdocs(spark, [(200, _DOC_UNRELATED)]), 1)
    # deltas exist pre-compaction
    kids = os.listdir(f"{index_dir}/bands")
    assert sorted(k for k in kids if k.startswith("batch_id=")) == [
        "batch_id=-1", "batch_id=0", "batch_id=1",
    ]

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS lsmidx LOCATION '{tmp_path}/db'"
    )
    try:
        dedup_ingest.compact_dedup_index_bucketed(
            spark, index_dir, "lsmidx.lsh", buckets=16
        )
        # path tree folded to a single base partition
        for part in ("bands", "shingles", "sizes"):
            kids = os.listdir(f"{index_dir}/{part}")
            assert [
                k for k in kids if k.startswith("batch_id=")
            ] == ["batch_id=-1"]

        probe = _mkdocs(
            spark,
            [(300, _DOC_A_NEARDUP), (301, "totally novel content here")],
        ).localCheckpoint()
        got_df = dedup_ingest.bucketed_batch_verdicts(
            spark, probe, "lsmidx.lsh"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got_df.explain("formatted")
        selected = [
            (int(a), int(b))
            for a, b in re.findall(
                r"SelectedBucketsCount: (\d+) out of (\d+)", buf.getvalue()
            )
        ]
        assert len(selected) >= 3
        assert all(sel < total for sel, total in selected)

        got = {
            r["doc_id"]: (r["verdict"], r["dup_of"])
            for r in got_df.collect()
        }
        want = {
            r["doc_id"]: (r["verdict"], r["dup_of"])
            for r in dedup_ingest.batch_verdicts(
                spark, probe, index_dir
            ).collect()
        }
        assert got == want
        # the delta doc (batch 0's kept 100) is the keeper — proof the
        # appends survived the fold into the bucketed layout
        assert got[300] == ("drop", 100)
        assert got[301] == ("keep", None)
    finally:
        for t in ("lsh_bands", "lsh_shingles", "lsh_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS lsmidx.{t}")
        spark.sql("DROP DATABASE IF EXISTS lsmidx")


class _FakeDeltaStore:
    """In-memory stand-in for one Delta table: rows keyed by
    (alias, entity_id), plus the commit-history userMetadata stamps the
    seam's replay dedup reads."""

    def __init__(self):
        self.rows = {}
        self.commits = []
        self.merge_calls = []
        self.history_limits = []
        self.exists = True  # isDeltaTable answer; create-path tests flip it


class _FakeRow(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


def _make_fake_delta(store):
    """A fake delta.tables.DeltaTable honoring exactly the surface the
    seam uses: isDeltaTable / forPath / history / alias / merge
    builder. execute() applies real additive-merge semantics to the
    in-memory store so the test can assert outcomes, and records the
    builder arguments so the test can assert the MERGE itself."""

    class _FakeMergeBuilder:
        def __init__(self, spark, source_df, condition):
            self._spark = spark
            self._source = source_df
            self._cond = condition
            self._update_set = None
            self._insert_all = False

        def whenMatchedUpdate(self, set):
            self._update_set = set
            return self

        def whenNotMatchedInsertAll(self):
            self._insert_all = True
            return self

        def execute(self):
            stamp = self._spark.conf.get(
                "spark.databricks.delta.commitInfo.userMetadata"
            )
            store.merge_calls.append(
                {
                    "condition": self._cond,
                    "update_set": self._update_set,
                    "insert_all": self._insert_all,
                    "stamp": stamp,
                }
            )
            assert self._update_set == {"count": "t.count + u.count"}
            assert self._insert_all
            for r in self._source.collect():
                k = (r["alias"], r["entity_id"])
                store.rows[k] = store.rows.get(k, 0) + r["count"]
            store.commits.append(stamp)

    class _FakeDeltaTable:
        @classmethod
        def isDeltaTable(cls, spark, path):
            return store.exists

        @classmethod
        def forPath(cls, spark, path):
            t = cls()
            t._spark = spark
            return t

        def history(self, limit=None):
            store.history_limits.append(limit)
            commits = store.commits if limit is None else store.commits[-limit:]

            class _H:
                def select(_self, col):
                    return _self

                def collect(_self):
                    return [_FakeRow(userMetadata=s) for s in commits]

            return _H()

        def alias(self, a):
            return self

        def merge(self, source_df, condition):
            return _FakeMergeBuilder(self._spark, source_df, condition)

    return _FakeDeltaTable


def test_delta_merge_seam_via_injected_fake(spark, tmp_path):
    """merge_upsert_batch_writer with an injected DeltaTable class must
    route through MERGE INTO instead of stage-and-promote: additive
    update semantics, history-backed replay idempotency (same batch_id
    re-applied is a no-op), per-commit userMetadata stamps, and the
    writer lease still held on the target."""
    import os

    import pyspark.sql.functions as F  # noqa: F401

    store = _FakeDeltaStore()
    target = str(tmp_path / "delta_target")
    writer = ingest.merge_upsert_batch_writer(
        spark, target, writer_id="w-delta",
        delta_table_cls=_make_fake_delta(store),
    )
    b0 = spark.createDataFrame(
        [("click", "0", 2), ("click", "0", 3), ("view", "1", 1)],
        "alias string, entity_id string, count bigint",
    )
    writer(b0, 0)
    # partial-aggregated before the merge: one source row per key
    assert store.rows == {("click", "0"): 5, ("view", "1"): 1}
    assert store.commits == ["batch=0"]
    call = store.merge_calls[0]
    assert call["condition"] == (
        "t.alias = u.alias AND t.entity_id = u.entity_id"
    )
    assert call["update_set"] == {"count": "t.count + u.count"}
    assert call["insert_all"] and call["stamp"] == "batch=0"

    b1 = spark.createDataFrame(
        [("click", "0", 10)], "alias string, entity_id string, count bigint"
    )
    writer(b1, 1)
    assert store.rows[("click", "0")] == 15
    writer(b1, 1)  # replay: history already holds batch=1 → no-op
    assert store.rows[("click", "0")] == 15
    assert store.commits == ["batch=0", "batch=1"]
    # the conf stamp is cleaned up after each commit
    assert (
        spark.conf.get(
            "spark.databricks.delta.commitInfo.userMetadata", None
        )
        is None
    )
    # single-writer lease discipline is unchanged on the Delta path
    assert os.path.exists(os.path.join(target, ingest.LEASE_FILE))


def test_delta_seam_first_batch_creates_table(spark, tmp_path, monkeypatch):
    """When the target is not yet a Delta table, the first batch goes
    through _delta_create_table with the bucketed partials and the
    idempotent (txnAppId, txnVersion) identity."""
    created = {}

    def fake_create(partials, target_dir, writer_id, batch_id):
        created["cols"] = set(partials.columns)
        created["rows"] = {
            (r["alias"], r["entity_id"]): r["count"]
            for r in partials.collect()
        }
        created["target"] = target_dir
        created["writer_id"] = writer_id
        created["batch_id"] = batch_id

    monkeypatch.setattr(ingest, "_delta_create_table", fake_create)

    class _NeverDelta:
        @classmethod
        def isDeltaTable(cls, spark, path):
            return False

    target = str(tmp_path / "delta_new")
    writer = ingest.merge_upsert_batch_writer(
        spark, target, writer_id="w0", delta_table_cls=_NeverDelta
    )
    b = spark.createDataFrame(
        [("a", "1", 1), ("a", "1", 2)],
        "alias string, entity_id string, count bigint",
    )
    writer(b, 7)
    assert created["cols"] == {"alias", "entity_id", "count", "pk"}
    assert created["rows"] == {("a", "1"): 3}
    assert created["target"] == target
    assert created["writer_id"] == "w0" and created["batch_id"] == 7


def test_delta_seam_absent_without_injection(spark, tmp_path):
    """In this container delta does not import, so the default writer
    must be the parquet stage-and-promote path (the emulation contract
    the crash/lease tests pin) — not an AttributeError at first batch."""
    assert ingest._import_delta() is None
    target = str(tmp_path / "plain")
    writer = ingest.merge_upsert_batch_writer(spark, target, writer_id="wp")
    b = spark.createDataFrame(
        [("a", "1", 1)], "alias string, entity_id string, count bigint"
    )
    writer(b, 0)
    got = spark.read.parquet(target).collect()
    assert [(r["alias"], r["entity_id"], r["count"]) for r in got] == [
        ("a", "1", 1)
    ]


def test_delta_create_branch_is_replay_idempotent(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9: the table-CREATING batch must be replay-safe. The
    create commit now carries the same ``batch=<id>`` userMetadata
    stamp as MERGE commits, so a replay that finds the table existing
    takes the merge branch, sees the stamp in history, and no-ops —
    instead of re-applying the additive merge and double-counting
    every key from the first batch."""
    store = _FakeDeltaStore()
    store.exists = False  # not a Delta table until batch 0 creates it

    def fake_write(self):
        """Stand-in for partials.write on the Delta format: applies the
        rows to the store and records — like real Delta — the
        userMetadata stamp carried by the PER-WRITE option (the create
        path no longer touches the session conf; see
        test_delta_create_table_sets_userMetadata_stamp)."""
        df = self

        class _W:
            _opts = {}

            def format(self, f):
                return self

            def partitionBy(self, c):
                return self

            def option(self, k, v):
                self._opts[k] = v
                return self

            def save(self, path):
                for r in df.collect():
                    k = (r["alias"], r["entity_id"])
                    store.rows[k] = store.rows.get(k, 0) + r["count"]
                store.commits.append(self._opts.get("userMetadata"))
                store.exists = True

        return _W()

    b0 = spark.createDataFrame(
        [("click", "0", 2), ("view", "1", 1)],
        "alias string, entity_id string, count bigint",
    )
    # patch the CONCRETE DataFrame class (pyspark 4: classic.dataframe)
    monkeypatch.setattr(type(b0), "write", property(fake_write))
    target = str(tmp_path / "delta_create_replay")
    writer = ingest.merge_upsert_batch_writer(
        spark,
        target,
        writer_id="w0",
        delta_table_cls=_make_fake_delta(store),
    )
    writer(b0, 0)
    assert store.rows == {("click", "0"): 2, ("view", "1"): 1}
    assert store.commits == ["batch=0"]

    # At-least-once replay of the CREATE batch: table now exists, the
    # merge branch consults history, finds batch=0, and no-ops.
    writer(b0, 0)
    assert store.rows == {("click", "0"): 2, ("view", "1"): 1}
    assert store.commits == ["batch=0"]
    assert store.merge_calls == []


def test_delta_create_table_sets_userMetadata_stamp(spark, monkeypatch):
    """Unit pin on the production _delta_create_table: the batch stamp
    rides the PER-WRITE userMetadata option (race-free across writers
    sharing the session) and the session conf is never touched — a
    pre-existing user-set session stamp survives the create."""
    seen = {}
    meta_key = "spark.databricks.delta.commitInfo.userMetadata"

    class _FakeWriter:
        def __init__(self, df):
            self._df = df

        def format(self, f):
            return self

        def partitionBy(self, c):
            return self

        def option(self, k, v):
            seen[k] = v
            return self

        def save(self, path):
            seen["conf_at_save"] = self._df.sparkSession.conf.get(
                meta_key, None
            )

    df = spark.createDataFrame(
        [("a", "1", 1, 0)],
        "alias string, entity_id string, count bigint, pk int",
    )
    monkeypatch.setattr(
        type(df), "write", property(lambda self: _FakeWriter(self))
    )
    spark.conf.set(meta_key, "user-set-stamp")
    try:
        ingest._delta_create_table(df, "/tmp/nowhere", "w9", 4)
    finally:
        user_stamp_after = spark.conf.get(meta_key, None)
        spark.conf.unset(meta_key)
    assert seen["userMetadata"] == "batch=4"
    assert seen["txnAppId"] == "w9" and seen["txnVersion"] == 4
    # the session conf is not the stamp channel on the create path
    assert seen["conf_at_save"] == "user-set-stamp"
    assert user_stamp_after == "user-set-stamp"


def test_delta_refuses_to_create_over_parquet_state(spark, tmp_path):
    """ADVICE r9: the Delta create path must not build a table inside
    a directory holding parquet stage-and-promote state — that is an
    existing table in the OTHER protocol, and mixing produces a failed
    tree instead of resuming the ledger."""
    import os

    import pytest

    store = _FakeDeltaStore()
    store.exists = False
    target = str(tmp_path / "parquet_protocol_target")
    os.makedirs(os.path.join(target, "pk=3"))
    open(os.path.join(target, "_merged_batch_0"), "w").close()
    writer = ingest.merge_upsert_batch_writer(
        spark,
        target,
        writer_id="w1",
        delta_table_cls=_make_fake_delta(store),
    )
    b = spark.createDataFrame(
        [("a", "1", 1)], "alias string, entity_id string, count bigint"
    )
    with pytest.raises(RuntimeError, match="parquet merge-protocol state"):
        writer(b, 0)
    assert store.rows == {} and store.commits == []


def test_delta_requires_explicit_opt_in(spark, tmp_path, monkeypatch):
    """ADVICE r9: import-detection must not flip the sink format. With
    delta importable but use_delta unset, the writer stays on the
    parquet stage-and-promote protocol; use_delta=True without the
    package raises instead of silently falling back."""
    import os

    import pytest

    store = _FakeDeltaStore()
    monkeypatch.setattr(
        ingest, "_import_delta", lambda: _make_fake_delta(store)
    )
    target = str(tmp_path / "no_optin")
    writer = ingest.merge_upsert_batch_writer(spark, target, writer_id="w2")
    b = spark.createDataFrame(
        [("a", "1", 1)], "alias string, entity_id string, count bigint"
    )
    writer(b, 0)
    # parquet protocol ran: ledger marker + bucket dirs, no Delta commits
    assert os.path.exists(os.path.join(target, "_merged_batch_0"))
    assert store.commits == [] and store.rows == {}

    monkeypatch.setattr(ingest, "_import_delta", lambda: None)
    with pytest.raises(RuntimeError, match="use_delta=True"):
        ingest.merge_upsert_batch_writer(
            spark, str(tmp_path / "x"), writer_id="w3", use_delta=True
        )


def test_delta_history_scan_is_bounded(spark, tmp_path):
    """ADVICE r9: the replay-dedup scan reads only the last
    DELTA_HISTORY_LOOKBACK commits, not the full (unboundedly growing)
    table history."""
    store = _FakeDeltaStore()
    target = str(tmp_path / "bounded_history")
    writer = ingest.merge_upsert_batch_writer(
        spark,
        target,
        writer_id="w4",
        delta_table_cls=_make_fake_delta(store),
    )
    b = spark.createDataFrame(
        [("a", "1", 1)], "alias string, entity_id string, count bigint"
    )
    writer(b, 0)
    writer(b, 1)
    assert store.history_limits == [
        ingest.DELTA_HISTORY_LOOKBACK,
        ingest.DELTA_HISTORY_LOOKBACK,
    ]
    # a stamp older than the lookback window is invisible — the dedup
    # contract holds because foreachBatch never replays that far back
    store.commits = [f"batch={i}" for i in range(500)]
    writer(b, 499)  # within window → deduped
    assert len(store.commits) == 500


def test_delta_create_recovers_from_crashed_first_commit(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10: the Delta create itself writes partitionBy('pk')
    data files BEFORE the first _delta_log commit, so a crash in that
    window leaves bare pk=* dirs with no ledger markers. On replay
    isDeltaTable is still false; the protocol guard must treat that as
    recoverable (Delta's create only consults its log) instead of
    raising forever and wedging the stream. Parquet-protocol state is
    identified by its ledger markers, which always coexist with any
    pk= bucket the protocol promotes."""
    import os

    created = {}
    monkeypatch.setattr(
        ingest,
        "_delta_create_table",
        lambda partials, target_dir, writer_id, batch_id: created.update(
            batch_id=batch_id
        ),
    )

    class _NeverDelta:
        @classmethod
        def isDeltaTable(cls, spark, path):
            return False

    target = str(tmp_path / "crashed_delta_create")
    os.makedirs(os.path.join(target, "pk=3"))  # debris, no markers
    writer = ingest.merge_upsert_batch_writer(
        spark, target, writer_id="w5", delta_table_cls=_NeverDelta
    )
    b = spark.createDataFrame(
        [("a", "1", 1)], "alias string, entity_id string, count bigint"
    )
    writer(b, 0)  # replay of the crashed create: recovers, no raise
    assert created == {"batch_id": 0}

    # …but a staging ledger marker WITHOUT pk= dirs still refuses:
    # that is parquet-protocol state mid-flight.
    import pytest

    target2 = str(tmp_path / "staged_parquet_state")
    os.makedirs(os.path.join(target2, "_staging_batch_0"))
    writer2 = ingest.merge_upsert_batch_writer(
        spark, target2, writer_id="w6", delta_table_cls=_NeverDelta
    )
    with pytest.raises(RuntimeError, match="parquet merge-protocol state"):
        writer2(b, 0)


def test_protocol_guard_refuses_committed_merge_alias_counts(
    spark, tmp_path
):
    """ADVICE r11: merge_alias_counts writes bare pk=* buckets with no
    ledger markers — at the filesystem level indistinguishable from
    crashed Delta-create debris with data files. The guard must refuse
    to create a Delta table over marker-less pk= buckets that HOLD
    data files (the existing counts would become invisible to Delta
    readers → silent undercount) unless the operator explicitly passes
    reclaim_bare_buckets=True; EMPTY pk= dirs (nothing to lose) stay
    auto-recoverable."""
    import os

    import pytest

    # end-to-end: a real merge_alias_counts table (pk= buckets with
    # committed data files, no markers) refuses by default…
    target = str(tmp_path / "alias_counts_table")
    updates = spark.createDataFrame(
        [("a", "1", 2)], "alias string, entity_id string, count bigint"
    )
    ingest.merge_alias_counts(spark, target, updates)
    with pytest.raises(RuntimeError, match="reclaim_bare_buckets"):
        ingest._refuse_parquet_protocol_state(target, spark)
    # …and the refusal reaches the writer's create path
    class _NeverDelta:
        @classmethod
        def isDeltaTable(cls, spark, path):
            return False

    writer = ingest.merge_upsert_batch_writer(
        spark, target, writer_id="wg1", delta_table_cls=_NeverDelta
    )
    with pytest.raises(RuntimeError, match="parquet merge-protocol state"):
        writer(updates, 0)

    # the explicit operator flag opts in to reclaiming the buckets
    ingest._refuse_parquet_protocol_state(
        target, spark, reclaim_bare_buckets=True
    )

    # bare pk= debris without data files stays auto-recoverable
    target3 = str(tmp_path / "crashed_debris")
    os.makedirs(os.path.join(target3, "pk=5"))
    ingest._refuse_parquet_protocol_state(target3, spark)


def test_protocol_guard_lists_file_uri_via_hadoop_fs(spark, tmp_path):
    """ADVICE r10: the guard lists the target through the Hadoop
    FileSystem API, so it works on URIs a driver-local os.listdir
    cannot see (file:, s3a:, abfss:, …) — exercised here with the
    file: scheme, which FileNotFoundError'd the old os.listdir path."""
    import os

    import pytest

    target = str(tmp_path / "uri_target")
    os.makedirs(target)
    open(os.path.join(target, "_merged_batch_0"), "w").close()
    with pytest.raises(RuntimeError, match="parquet merge-protocol state"):
        ingest._refuse_parquet_protocol_state(f"file:{target}", spark)
    # absent target (any scheme) is silently fine
    ingest._refuse_parquet_protocol_state(
        f"file:{tmp_path}/does_not_exist", spark
    )


def test_delta_merge_restores_prior_session_stamp(spark, tmp_path):
    """ADVICE r10: the MERGE path must save-and-restore any
    pre-existing user-set userMetadata conf value instead of
    unconditionally unsetting it."""
    meta_key = "spark.databricks.delta.commitInfo.userMetadata"
    store = _FakeDeltaStore()
    writer = ingest.merge_upsert_batch_writer(
        spark,
        str(tmp_path / "restore_stamp"),
        writer_id="w7",
        delta_table_cls=_make_fake_delta(store),
    )
    b = spark.createDataFrame(
        [("a", "1", 1)], "alias string, entity_id string, count bigint"
    )
    spark.conf.set(meta_key, "user-session-stamp")
    try:
        writer(b, 0)
        assert store.commits == ["batch=0"]
        assert spark.conf.get(meta_key, None) == "user-session-stamp"
    finally:
        spark.conf.unset(meta_key)


def test_delta_stamp_interleaved_writers_both_stamped(spark, tmp_path):
    """Round-10 verdict finding: two MERGE sinks for DIFFERENT targets
    sharing one SparkSession (one driver process, two foreachBatch
    threads — the per-target lease does not serialize across tables)
    must not interleave the session-global userMetadata stamp window.
    Writer A blocks mid-execute (where real Delta reads the stamp, at
    commit time); writer B attempts its own merge concurrently. With
    the stamp lock, B waits until A's commit completes and BOTH commits
    carry their own batch id; against the unlocked code, B runs through
    A's window and A's commit lands unstamped (B's finally restores
    first) — an unstamped commit re-applies on replay (double-count)."""
    import threading

    meta_key = "spark.databricks.delta.commitInfo.userMetadata"
    a_mid, a_go = threading.Event(), threading.Event()
    commits_a, commits_b = [], []

    def make_fake(commits, mid=None, go=None):
        class _Builder:
            def whenMatchedUpdate(self, set):
                return self

            def whenNotMatchedInsertAll(self):
                return self

            def execute(self):
                if mid is not None:
                    mid.set()
                    assert go.wait(timeout=30)
                # real Delta reads the stamp at COMMIT time — the end
                # of execute(), after any concurrent writer interleaved
                commits.append(spark.conf.get(meta_key, None))

        class _Fake:
            @classmethod
            def isDeltaTable(cls, s, path):
                return True

            @classmethod
            def forPath(cls, s, path):
                return cls()

            def history(self, limit=None):
                class _H:
                    def select(_self, col):
                        return _self

                    def collect(_self):
                        return []

                return _H()

            def alias(self, a):
                return self

            def merge(self, src, cond):
                return _Builder()

        return _Fake

    writer_a = ingest.merge_upsert_batch_writer(
        spark,
        str(tmp_path / "tgt_a"),
        writer_id="wA",
        delta_table_cls=make_fake(commits_a, a_mid, a_go),
    )
    writer_b = ingest.merge_upsert_batch_writer(
        spark,
        str(tmp_path / "tgt_b"),
        writer_id="wB",
        delta_table_cls=make_fake(commits_b),
    )
    b = spark.createDataFrame(
        [("a", "1", 1)], "alias string, entity_id string, count bigint"
    )
    ta = threading.Thread(target=writer_a, args=(b, 3))
    ta.start()
    assert a_mid.wait(timeout=30)
    tb = threading.Thread(target=writer_b, args=(b, 7))
    tb.start()
    tb.join(timeout=2.0)
    # B is serialized behind A's stamp window, not interleaved into it
    assert tb.is_alive(), "writer B ran inside writer A's stamp window"
    a_go.set()
    ta.join(timeout=30)
    tb.join(timeout=30)
    assert commits_a == ["batch=3"]
    assert commits_b == ["batch=7"]
    assert spark.conf.get(meta_key, None) is None
