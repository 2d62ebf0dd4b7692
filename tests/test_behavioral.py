"""Behavioral tests for inventory-only operators (SURVEY.md §2.1 tail):
approx_count_distinct accuracy and watermark late-data dropping — the
two declared behaviors that can't be oracle-hashed.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from wikid_spark.catalog import table
from wikid_spark.streaming.windows import tumbling_counts

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    """HLL++ estimate within the configured relative standard deviation
    of the exact count (5 sigma margin to keep the test deterministic
    in practice)."""
    events = table(spark, SF, "events")
    row = events.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(5, 0.1 * row["exact"])


def test_watermark_gates_append_emission(spark, tmp_path):
    """The watermark's GUARANTEED semantics: in append mode a window is
    emitted only once the watermark passes its end, and windows still
    inside the watermark horizon are withheld in state. (Dropping of
    too-late input is explicitly best-effort in Spark — observed
    numRowsDroppedByWatermark=0 for an already-finalizable window — so
    the test pins the deterministic side of the contract, not the
    best-effort side.)"""
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "0.json", "w") as f:
        f.write(json.dumps({"ts": "2024-01-01 09:00:00", "event_type": "a"}) + "\n")
        f.write(json.dumps({"ts": "2024-01-01 11:00:00", "event_type": "a"}) + "\n")
        f.write(json.dumps({"ts": "2024-01-01 12:00:00", "event_type": "a"}) + "\n")
    stream = (
        spark.readStream.schema("ts string, event_type string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        tumbling_counts(stream, window="1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].hour, r["n_events"])
        for r in spark.table("t_late").collect()
    }
    # watermark advanced to 12:00 - 10min = 11:50: the 9-10 window
    # (end 10:00 <= 11:50) is finalized and emitted; the 11-12 and
    # 12-13 windows (ends past the watermark) are withheld in state.
    assert got == {(9, 1)}
    wm = q.lastProgress["eventTime"].get("watermark")
    assert wm == "2024-01-01T11:50:00.000Z"
    # the batch twin has no watermark concept: every window appears.
    batch = {
        (r["window_start"].hour, r["n_events"])
        for r in tumbling_counts(
            spark.read.schema("ts string, event_type string")
            .json(str(src))
            .withColumn("ts", F.to_timestamp("ts")),
            window="1 hour",
        ).collect()
    }
    assert batch == {(9, 1), (11, 1), (12, 1)}


def test_simhash_banding_finds_all_hamming3_pairs(spark):
    """Pigeonhole completeness of the 15-bit chunk LSH (four
    SIMHASH_CHUNK_BITS-wide chunks cover 60 bits; Hamming ≤ 3 flips at
    most 3 chunks, so one chunk always matches exactly): the banded
    equi-join in nd_simhash_candidates must recover EVERY pair of
    signatures within Hamming distance 3, independently verified here
    against a driver-side brute-force over all signature pairs."""
    from wikid_spark.queries.dedup import _simhash_df, nd_simhash_candidates

    sf = "/root/testdata/sf0.001"
    sigs = {r["doc_id"]: r["simhash"] for r in _simhash_df(spark, sf).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    banded = {
        (r["doc_a"], r["doc_b"]) for r in nd_simhash_candidates(spark, sf).collect()
    }
    assert banded == brute
    assert brute, "fixture should produce at least one near-dup pair"


def test_graph_iteration_checkpointing_bounds_lineage(spark):
    """pagerank/connected_components survive 10 iterations when
    checkpoint_every is set: results identical to the fully-unrolled
    DAG, and the final plan is lineage-cut (rooted at the materialized
    RDD, not 10 stacked join layers)."""
    from wikid_spark.operators.graph import connected_components, pagerank

    li = table(spark, "/root/testdata/sf0.001", "lineitem")
    e0 = li.select(
        F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    # equivalence vs the unrolled DAG at 6 iters (10 unrolled takes
    # minutes of pure plan analysis — which is the pathology the
    # checkpoint exists to avoid; 6 is deep enough to cross two
    # checkpoint boundaries)
    plain = pagerank(edges, iters=6)
    r_plain = {r["id"]: round(r["rank"], 10) for r in plain.collect()}
    r_ckpt = {
        r["id"]: round(r["rank"], 10)
        for r in pagerank(edges, iters=6, checkpoint_every=3).collect()
    }
    assert r_ckpt == r_plain

    cc_plain = connected_components(edges, iters=6)
    cc_ckpt = connected_components(edges, iters=6, checkpoint_every=3)
    assert {tuple(r) for r in cc_ckpt.collect()} == {
        tuple(r) for r in cc_plain.collect()
    }

    # 10 iterations with checkpointing completes, and lineage is
    # actually cut: the plan roots at an existing RDD scan instead of
    # replaying every unrolled iteration
    ckpt10 = pagerank(edges, iters=10, checkpoint_every=3)
    assert ckpt10.count() == plain.count()
    ckpt_plan = ckpt10._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in ckpt_plan or "ExistingRDD" in ckpt_plan
    plain_plan = plain._jdf.queryExecution().optimizedPlan().toString()
    assert len(ckpt_plan) < len(plain_plan)
