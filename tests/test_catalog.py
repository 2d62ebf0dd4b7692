"""catalog.corpus_rows: parquet-footer row counts vs a real Spark count.

The derived-K index sizing (queries/similarity.py, queries/dedup.py)
needs only the unfiltered cardinality of a table; reading it from
parquet footers is O(#files) driver-side metadata work where a
DataFrame.count() is a full corpus scan. These tests pin the contract:
footer count == Spark count, single-file and directory-shaped tables
both work, the memo cache invalidates on rewrite, and unknown table
names fail loudly.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_DIR, SF_DIR_SMALL
from wikid_spark.catalog import TABLES, corpus_rows, table


@pytest.mark.parametrize("name", ["embeddings", "documents", "lineitem"])
def test_corpus_rows_matches_spark_count(spark, name):
    assert corpus_rows(SF_DIR, name) == table(spark, SF_DIR, name).count()


def test_corpus_rows_differs_across_sf():
    # Distinct scale factors must not share cache entries.
    # (embeddings is 500 rows at both sf0.001 and sf0.01 by design,
    # so use lineitem, which actually scales.)
    small = corpus_rows(SF_DIR_SMALL, "lineitem")
    big = corpus_rows(SF_DIR, "lineitem")
    assert 0 < small < big


def test_corpus_rows_unknown_table():
    with pytest.raises(KeyError):
        corpus_rows(SF_DIR, "nope")


def test_corpus_rows_directory_table_and_cache_invalidation(spark, tmp_path):
    # Directory-shaped table (multi-file parquet, the cluster layout).
    sf = str(tmp_path)
    dest = os.path.join(sf, "embeddings.parquet")
    emb = table(spark, SF_DIR_SMALL, "embeddings").limit(100)
    emb.repartition(4).write.parquet(dest)
    assert corpus_rows(sf, "embeddings") == 100
    # Rewrite with different cardinality: the (size, mtime) signature
    # must invalidate the memo, not serve the stale count.
    emb.limit(37).repartition(2).write.mode("overwrite").parquet(dest)
    assert corpus_rows(sf, "embeddings") == 37


def test_corpus_rows_all_tables_nonempty():
    for name in TABLES:
        assert corpus_rows(SF_DIR_SMALL, name) > 0


def _orphan_vec_ids(sf: str) -> int:
    import duckdb

    con = duckdb.connect()
    return con.execute(
        f"""SELECT COUNT(*)
        FROM read_parquet('{sf}/embeddings.parquet') e
        WHERE NOT EXISTS (
          SELECT 1 FROM read_parquet('{sf}/documents.parquet') d
          WHERE d.doc_id = e.vec_id)"""
    ).fetchone()[0]


@pytest.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_embeddings_vec_id_subset_of_documents(sf):
    """The catalog contract: every embeddings.vec_id is a
    documents.doc_id (the vector OF that document). The semantic-gate
    composites join on it."""
    assert _orphan_vec_ids(sf) == 0


def test_gen_sf_preserves_vec_id_contract(tmp_path):
    """tools/gen_sf.py must shift vec_id by the DOCUMENTS stride so
    copy i's vectors land on copy i's document ids — with the
    embeddings stride (|emb| < |docs|), copy-1 vec_ids would collide
    with copy-0 doc_ids and pair vectors with the wrong copies' text
    (round-8 ADVICE finding)."""
    import subprocess
    import sys

    out = str(tmp_path / "sf_scaled")
    subprocess.run(
        [sys.executable, "/root/repo/tools/gen_sf.py",
         "/root/testdata/sf0.001", out, "3"],
        check=True, capture_output=True,
    )
    assert _orphan_vec_ids(out) == 0
    # and the pairing is copy-faithful: copy i's vec_id block sits at
    # i * |documents|, so ids beyond |documents| exist iff factor > 1
    import duckdb

    con = duckdb.connect()
    n_docs_src = con.execute(
        "SELECT COUNT(*) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    above = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/embeddings.parquet') "
        f"WHERE vec_id > {n_docs_src}"
    ).fetchone()[0]
    assert above > 0


def test_est_scan_splits_math(tmp_path):
    """One split per 128 MB chunk per file, at least one per file —
    from stats alone, cached on the content signature."""
    from wikid_spark import catalog as C

    # build a fake sf dir with a tiny parquet for a known table name
    import shutil

    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                tmp_path / "documents.parquet")
    est = C._est_scan_splits(str(tmp_path), "documents")
    assert est == 1  # one small file -> one split

    # estimate is pure arithmetic on sizes: a hypothetical 300 MB file
    # would plan ceil(300/128) = 3 splits (checked via the cache seam)
    sig = C._table_sig(str(tmp_path), "documents")
    fake_sig = (sig[0], ((sig[1][0][0], 300 * 1024 * 1024, 0),))
    C._SPLIT_EST_CACHE.pop(fake_sig, None)
    got = sum(max(1, -(-size // (128 * 1024 * 1024))) for _, size, _ in fake_sig[1])
    assert got == 3


def test_compute_dense_scan_is_spread(spark):
    """documents/embeddings scans gain exactly one roundrobin exchange
    when the layout under-parallelizes; star-schema tables never do."""
    from wikid_spark import catalog as C

    sf = "/root/testdata/sf0.001"
    target = spark.sparkContext.defaultParallelism
    for name in ("documents", "embeddings"):
        df = C.table(spark, sf, name)
        assert df.rdd.getNumPartitions() == target, name
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "roundrobin" in plan.lower(), name
    # non-dense tables keep the raw scan (no exchange)
    lt = C.table(spark, sf, "lineitem")
    assert "Exchange" not in lt._jdf.queryExecution().executedPlan().toString()


def test_spread_preserves_filter_pushdown(spark):
    """Catalyst must move predicates below the spread Repartition so
    they still reach the parquet scan as PushedFilters."""
    import pyspark.sql.functions as F
    from wikid_spark import catalog as C

    df = C.table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 100
    )
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan
    assert "LessThan(vec_id,100)" in plan


def test_spread_for_compute_noop_when_parallel(spark):
    """spread_for_compute leaves an already-parallel DataFrame alone."""
    from wikid_spark.catalog import spread_for_compute

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, target * 2)
    assert spread_for_compute(wide) is wide
    narrow = spark.range(0, 1000, 1, 1)
    assert spread_for_compute(narrow).rdd.getNumPartitions() == target


def test_size_bytes_parser():
    """Spark byte-string grammar: bare ints, b/k/m/g suffixes, case-
    insensitive, bad input falls back to the default."""
    from wikid_spark.catalog import _size_bytes

    assert _size_bytes("128MB", 0) == 128 * 1024**2
    assert _size_bytes("134217728b", 0) == 134217728
    assert _size_bytes("1g", 0) == 1024**3
    assert _size_bytes("4194304", 0) == 4194304
    assert _size_bytes(None, 7) == 7
    assert _size_bytes("nonsense", 7) == 7


def test_est_scan_splits_honors_conf(tmp_path):
    """A non-default maxPartitionBytes / explicit minPartitionNum
    changes the estimate the way Spark's planner would (verdict r13
    #5). 300 MB sparse file: default -> ceil(300/128)=3; explicit
    minPartitionNum=64 shrinks the split to ~4.75 MB -> 64."""
    from wikid_spark import catalog as C

    p = tmp_path / "documents.parquet"
    with open(p, "wb") as f:
        f.truncate(300 * 1024 * 1024)  # sparse — no disk cost
    assert C._est_scan_splits(str(tmp_path), "documents") == 3
    assert (
        C._est_scan_splits(str(tmp_path), "documents", max_bytes=64 * 1024**2)
        == 5
    )
    assert (
        C._est_scan_splits(str(tmp_path), "documents", min_partitions=64)
        == 64
    )


def test_table_spread_decision_flips_with_session_conf(spark):
    """table() reads the SESSION's maxPartitionBytes: tuned to 1 KB
    splits, the sf0.001 documents scan plans ~64 splits >= 32 cores,
    so the compute spread must NOT fire; at the default it must."""
    from wikid_spark import catalog as C

    sf = "/root/testdata/sf0.001"
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "1k")
        plan = C.table(spark, sf, "documents")._jdf.queryExecution()
        assert "Repartition" not in plan.logical().toString()
        spark.conf.set(key, "128MB")
        plan = C.table(spark, sf, "documents")._jdf.queryExecution()
        assert "Repartition" in plan.logical().toString()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_spread_for_compute_runs_no_job(spark, monkeypatch):
    """The spread decision must never touch df.rdd (ADVICE r13: under
    AQE that finalizes the physical plan and can materialize upstream
    stages at plan-construction time — one extra job per streaming
    micro-batch). Pin it by making .rdd explode for the duration."""
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame
    from wikid_spark.catalog import spread_for_compute

    def _boom(self):
        raise AssertionError("spread_for_compute touched df.rdd")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))

    # tier 1 — plan already exchanges: aggregate / repartition no-op
    agg = spark.range(0, 100, 1, 1).groupBy((F.col("id") % 3).alias("g")).count()
    assert spread_for_compute(agg) is agg
    rep = spark.range(0, 100, 1, 1).repartition(4).selectExpr("id * 2 AS id")
    assert spread_for_compute(rep) is rep
    # Range tier — split count read from the logical node
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, target * 2)
    assert spread_for_compute(wide) is wide
    narrow = spark.range(0, 1000, 1, 1)
    assert spread_for_compute(narrow) is not narrow
    # tier 3 — local relation (micro-batch shaped): spread fires
    local = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert spread_for_compute(local) is not local


def test_spread_for_compute_file_backed_tiers(spark, tmp_path):
    """File-backed frames estimate splits from file count/sizes with
    the session conf — one tiny file spreads, >= cores files don't."""
    from wikid_spark.catalog import spread_for_compute

    target = spark.sparkContext.defaultParallelism
    one = str(tmp_path / "one")
    spark.range(0, 100, 1, 1).selectExpr("id AS doc_id").write.parquet(one)
    df = spark.read.parquet(one)
    assert spread_for_compute(df) is not df
    many = str(tmp_path / "many")
    spark.range(0, 1000, 1, target).selectExpr("id AS doc_id").write.parquet(
        many
    )
    df = spark.read.parquet(many)
    assert spread_for_compute(df) is df
