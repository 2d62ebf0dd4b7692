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
