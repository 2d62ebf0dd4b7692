"""Bucketed co-located join: the write-once-shuffle-never layout.

Pins the property the utility exists for: an equi-join of two tables
bucketed on the join key plans with ZERO Exchange — at 100 TB this is
the difference between a nightly shuffle of the fact table and none.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from wikid_spark.catalog import table
from wikid_spark.sources.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{d}'")
    write_bucketed(table(spark, SF, "orders"), "bucketdb.orders_b", "o_orderkey", 4)
    write_bucketed(
        table(spark, SF, "lineitem"), "bucketdb.lineitem_b", "l_orderkey", 4
    )
    yield "bucketdb.orders_b", "bucketdb.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bucketdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bucketdb.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bucketdb")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # force the join strategy bucketing optimizes (broadcast would hide
    # the property under test)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, orders_b, lineitem_b, "o_orderkey", "l_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "SelectedBucketsCount" in plan
        # within-bucket sortBy removes the per-task Sort too
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # correctness: same rows as the plain parquet join
    o, li = table(spark, SF, "orders"), table(spark, SF, "lineitem")
    want = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
    assert j.count() == want and want > 0


@pytest.fixture(scope="module")
def dedup_index_tables(spark, tmp_path_factory):
    from wikid_spark.streaming.dedup_ingest import persist_dedup_index_bucketed

    d = tmp_path_factory.mktemp("dedupidx")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS dedupidx LOCATION '{d}'")
    corpus = table(spark, SF, "documents").select("doc_id", "text").filter(
        "doc_id % 10 != 0"
    )
    persist_dedup_index_bucketed(spark, corpus, "dedupidx.lsh", buckets=16)
    yield "dedupidx.lsh"
    for t in ("lsh_bands", "lsh_shingles", "lsh_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS dedupidx.{t}")
    spark.sql("DROP DATABASE IF EXISTS dedupidx")


def test_bucketed_index_probe_prunes_buckets(spark, tmp_path, dedup_index_tables):
    """A micro-batch probe against the bucketed LSH index must
    bucket-prune every index scan (SelectedBucketsCount < total) —
    the point of the layout: probe cost follows the batch's key set,
    not the corpus — and its verdicts must equal the path-partitioned
    index's on the same corpus/batch."""
    import re

    from wikid_spark.streaming.dedup_ingest import (
        batch_verdicts,
        bucketed_batch_verdicts,
        persist_dedup_index,
    )

    docs = table(spark, SF, "documents").select("doc_id", "text")
    batch = docs.filter("doc_id % 10 = 0").limit(5).localCheckpoint()
    got_df = bucketed_batch_verdicts(spark, batch, dedup_index_tables)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got_df.explain("formatted")
    plan = buf.getvalue()
    selected = [
        (int(a), int(b))
        for a, b in re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    ]
    # all three index tables scan pruned (bands via bsig, shingles and
    # sizes via doc_id)
    assert len(selected) >= 3
    assert all(sel < total for sel, total in selected)

    # correctness: identical verdicts vs the path-partitioned layout
    pdir = str(tmp_path / "plain_idx")
    corpus = docs.filter("doc_id % 10 != 0")
    persist_dedup_index(corpus, pdir)
    want = sorted(map(tuple, batch_verdicts(spark, batch, pdir).collect()))
    got = sorted(map(tuple, got_df.collect()))
    assert got == want and len(got) == 5
