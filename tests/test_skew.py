"""Equivalence tests for the skew-salting utilities: salted == unsalted."""

from __future__ import annotations

import pyspark.sql.functions as F

from wikid_spark.catalog import table
from wikid_spark.operators.skew import salted_count_distinct, salted_join

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_salted_join_equals_plain(spark):
    orders = table(spark, SF, "orders")
    customer = table(spark, SF, "customer").select("c_custkey", "c_name")
    big = orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    plain = big.join(customer, "c_custkey").select("o_orderkey", "c_name")
    salted = salted_join(big, customer, "c_custkey", n_salt=4).select(
        "o_orderkey", "c_name"
    )
    assert _sorted(salted) == _sorted(plain)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, w string")
    got = _sorted(salted_join(left, right, "k", n_salt=4, how="left").select("k", "v", "w"))
    want = _sorted(left.join(right, "k", "left").select("k", "v", "w"))
    assert got == want


def test_content_salt_retry_stable_and_spreads(spark):
    """The salt is a pure function of row content: two independent
    evaluations assign byte-identical salts (a retried task re-salts
    the same way), and a hot key still spreads across salts."""
    from wikid_spark.operators.skew import content_salt

    orders = table(spark, SF, "orders")
    big = orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    run1 = _sorted(big.withColumn("_salt", content_salt(big, 4)))
    run2 = _sorted(big.withColumn("_salt", content_salt(big, 4)))
    assert run1 == run2
    # Hot key (every row shares c_custkey=1) spreads over all 4 salts
    # because o_orderkey varies.
    hot = spark.createDataFrame(
        [(1, i) for i in range(64)], "c_custkey int, o_orderkey int"
    )
    n_salts = (
        hot.withColumn("_salt", content_salt(hot, 4))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 4


def test_salted_count_distinct_exact(spark):
    events = table(spark, SF, "events")
    plain = _sorted(
        events.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("n_distinct_user_id")
        )
    )
    salted = _sorted(salted_count_distinct(events, ["event_type"], "user_id"))
    assert salted == plain
