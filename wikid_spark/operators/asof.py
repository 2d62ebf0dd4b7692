"""As-of (backward) join as a union+window composition.

Spark has no ASOF JOIN operator (SPARK-22947 open); the scalable
re-expression is: union the probe and build sides tagged, sort within
each key partition by (time, side), and carry the build side's payload
forward with last_value(ignoreNulls). Cost: ONE shuffle on the key —
no range-condition nested-loop join, no per-key collect. At 100 TB this
is the same shuffle a plain equi-join on the key would pay; skewed keys
are handled by AQE like any other window partition.

North-star extension (SURVEY.md §2 Q26); the reference has no
range/as-of joins (SURVEY.md §2 'Joins').
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_time: str,
    right_time: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """For each left row, attach ``right.value_col`` from the latest
    right row with ``right_time <= left_time`` sharing the ``by`` keys
    (NULL when none precedes). Ties on time prefer the right row
    (inclusive <=).
    """
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_v"),
    )
    # by-columns survive on both sides (they drive the partitioning);
    # every other left column is NULL on the build side.
    r = right.select(
        *[
            F.col(c).alias(c)
            if (c in by and c in right.columns)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(value_col).alias("_v"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_side"))  # right (0) before left (1) at equal t
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(out_col, F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_t", "_side", "_v")
    )
