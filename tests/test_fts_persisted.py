"""Persisted FTS serving index (VERDICT r14 #3).

The lexical twin of test_persisted_ann.py: (a) the build commits
term-bucketed postings + termstats + corpus stats under a _FTS_OK
marker, (b) persisted BM25 is value-identical to the in-plan path,
(c) the serve scan partition-prunes to EXACTLY the query terms'
buckets and pushes the term predicate into the parquet scan, and
(d) the content-keyed ensure is idempotent and invalidation-correct.
"""

from __future__ import annotations

import glob
import os
import re

import pyspark.sql.functions as F

from wikid_spark.catalog import table
from wikid_spark.operators import fts as O

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "vector"]


def _build(spark, tmp_path):
    out = str(tmp_path / "fts_index")
    O.persist_fts_index(table(spark, SF, "documents"), "doc_id", "text", out)
    return out


def test_persist_writes_committed_artifacts(spark, tmp_path):
    out = _build(spark, tmp_path)
    assert os.path.exists(os.path.join(out, O._FTS_OK))
    for part in ("postings", "termstats", "stats"):
        assert glob.glob(os.path.join(out, part, "**", "*.parquet"),
                         recursive=True), part
    # bucket layout: postings and termstats are tbucket-partitioned
    assert glob.glob(os.path.join(out, "postings", "tbucket=*"))
    assert glob.glob(os.path.join(out, "termstats", "tbucket=*"))
    # one file per bucket directory (the serve-side footer-cost bound)
    for d in glob.glob(os.path.join(out, "postings", "tbucket=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d


def test_persisted_bm25_matches_in_plan_twin(spark, tmp_path):
    out = _build(spark, tmp_path)
    docs = table(spark, SF, "documents")
    inplan = {
        r["doc"]: r["score"]
        for r in O.bm25_from_docs(docs, "doc_id", "text", TERMS)
        .select("doc", F.round("score", 4).alias("score"))
        .collect()
    }
    persisted = {
        r["doc"]: r["score"]
        for r in O.bm25_persisted(spark, out, TERMS)
        .select("doc", F.round("score", 4).alias("score"))
        .collect()
    }
    assert inplan == persisted


def test_persisted_scan_is_bucket_pruned(spark, tmp_path):
    """The 100 TB IO claim: the postings scan carries a tbucket
    PartitionFilter naming EXACTLY the query terms' buckets (directory
    pruning) and the term equality reaches PushedFilters (row-group
    pruning within the bucket via the build-time term sort)."""
    out = _build(spark, tmp_path)
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        probe = O.fts_persisted_postings(spark, out, TERMS)
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    m = re.search(
        r"PartitionFilters: \[tbucket#\d+ IN(?:SET)? \(?([0-9, ]+)", plan
    )
    assert m, plan[:4000]
    expect = {O._term_bucket_py(t) for t in TERMS}
    assert {int(x) for x in m.group(1).split(",")} == expect
    total = len(glob.glob(os.path.join(out, "postings", "tbucket=*")))
    assert len(expect) < total
    assert re.search(r"PushedFilters: \[.*In\(term", plan), plan[:4000]


def test_ensure_fts_index_caches_and_invalidates(spark, tmp_path, monkeypatch):
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    d1 = O.ensure_fts_index(spark, SF)
    assert os.path.exists(os.path.join(d1, O._FTS_OK))
    assert O.ensure_fts_index(spark, SF) == d1  # idempotent reuse

    # a corpus with different content (same table name) keys elsewhere
    import shutil

    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    for t in ("documents",):
        shutil.copy(f"{SF}/{t}.parquet", sf2 / f"{t}.parquet")
    os.utime(sf2 / "documents.parquet", (1, 1))  # different fingerprint
    d2 = O.ensure_fts_index(spark, str(sf2))
    assert d2 != d1
