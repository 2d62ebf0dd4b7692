"""Unit tests for the grouped-agg pandas UDAF (U4)."""

from __future__ import annotations

from wikid_spark.functions.udaf import grouped_weighted_median


def test_weighted_median_hand_computed(spark):
    # group a: values 1,2,3 weights 1,1,10 → cum 1,2,12; half=6 → median 3
    # group b: values 5,7 weights 3,1 → cum 3,4; half=2 → median 5
    # group c: tie run — values 4,4,9 weights 1,1,1 → half=1.5 → median 4
    df = spark.createDataFrame(
        [
            ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0),
            ("b", 5.0, 3.0), ("b", 7.0, 1.0),
            ("c", 4.0, 1.0), ("c", 4.0, 1.0), ("c", 9.0, 1.0),
        ],
        "g string, v double, w double",
    )
    got = {
        r["g"]: r["weighted_median"]
        for r in grouped_weighted_median(df, "g", "v", "w").collect()
    }
    assert got == {"a": 3.0, "b": 5.0, "c": 4.0}


def test_weighted_median_preaggregates_duplicates(spark):
    """Equal values collapse before the UDF: 1000 duplicate rows reach
    the Arrow kernel as ONE (value, summed-weight) row per distinct v."""
    rows = [("g", float(v % 3), 1.0) for v in range(3000)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = grouped_weighted_median(df, "g", "v", "w").collect()
    # weights 1000 per value {0,1,2}; half = 1500 → cum hits at v=1
    assert out[0]["weighted_median"] == 1.0
