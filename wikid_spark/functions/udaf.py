"""User-defined aggregates via Arrow grouped-agg pandas UDFs (U4).

PySpark's UDAF surface is the GROUPED_AGG pandas UDF: an Arrow-batched
reduction the planner runs per group after the usual hash partitioning.
Most aggregates should stay native (SURVEY.md U4: the reference's
counter merges all map onto built-in groupBy aggs); this module is for
the genuinely custom tail — here, a weighted median, which Spark has no
built-in for.

Scale: a grouped-agg UDF receives one group per call and cannot do
map-side partial aggregation — the full group's rows shuffle to one
task. Fine for bounded groups (flags, types); for high-cardinality or
skewed keys, pre-aggregate per (key, value) with a native sum of
weights first (done below) so the UDF sees at most |distinct values|
rows per group, not |rows|.
"""

from __future__ import annotations

import sys

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType

# Workers don't inherit the driver's sys.path for this package (see
# operators/annotate.py) — pickle the module by value.
from pyspark import cloudpickle  # noqa: E402

cloudpickle.register_pickle_by_value(sys.modules[__name__])


# DataType instance, not a DDL string: string return types are parsed
# eagerly and would require an active SparkSession at import time.
@F.pandas_udf(DoubleType())
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Lower weighted median: the smallest v whose cumulative weight
    (ascending by v) reaches half the total weight. Deterministic under
    ties because a run of equal values crosses the threshold as a unit.
    """
    df = pd.DataFrame({"v": values, "w": weights}).sort_values("v")
    cum = df["w"].cumsum()
    thr = float(df["w"].sum()) / 2.0
    return float(df["v"][(cum >= thr).values].iloc[0])


def grouped_weighted_median(
    df: DataFrame, key: str, value: str, weight: str
) -> DataFrame:
    """(key, weighted_median) with a native pre-aggregation: weights of
    equal values sum map-side first, so the Arrow UDF processes
    |distinct values| rows per group — the skew guard the docstring
    above prescribes."""
    pre = df.groupBy(key, value).agg(F.sum(weight).alias("_w"))
    return pre.groupBy(key).agg(
        weighted_median(F.col(value), F.col("_w")).alias("weighted_median")
    )
