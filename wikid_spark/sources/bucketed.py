"""Bucketed-table layout for co-located joins (100 TB design, SCALE.md).

The reference joins everything inside one SQLite file; at cluster scale
the equivalent "no data movement" join comes from bucketing: write both
fact tables bucketed (and sorted) by the join key into the catalog, and
every subsequent equi-join on that key runs with ZERO Exchange — the
shuffle is paid once at write time and amortized over every join after.

This is the layout decision that matters most at 100 TB: a daily-joined
key (entity id, order key) should be bucketed at ingest. Bucket count
rule of thumb: total_size / bucket_count ≈ 128–512 MiB per bucket file
per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) by ``key``. Sorting inside buckets additionally removes the
    per-task Sort from later sort-merge joins."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, left_key: str, right_key: str
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket keys —
    plans with no Exchange on either side (pinned by
    tests/test_bucketed.py)."""
    l, r = spark.table(left_name), spark.table(right_name)
    return l.join(r, l[left_key] == r[right_key])
