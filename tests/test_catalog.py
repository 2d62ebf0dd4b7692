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
