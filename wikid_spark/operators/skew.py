"""Skew mitigation: salting for Zipfian keys (SURVEY.md §7.6).

The wiki workloads are Zipf-distributed at every aggregation key that
matters — aliases ("the" problem, wikipedia.py:28 in the reference's
driver-memory dict), words (Q22), link targets. AQE's skew-join
splitting covers sort-merge joins; these utilities cover the two cases
it doesn't:

* ``salted_join`` — replicate-and-salt a broadcast-averse join where
  one key dominates: the big side gets a uniform salt, the small side
  is exploded across all salt values, the join key becomes
  (key, salt). Row multiplication is n_salt × |small|, bounded and
  chosen by the caller.
* ``salted_count_distinct`` — exact COUNT(DISTINCT v) per key with
  per-task state bounded by |values|/n_salt: stage 1 groups on
  (key, hash(v) % n) so each task sees a disjoint value range (the
  partial distinct-counts are therefore additive), stage 2 sums.

Both are pure compositions — no custom partitioner, no RDDs — so they
inherit whole-stage codegen and AQE like any DataFrame program.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def content_salt(df: DataFrame, n_salt: int) -> F.Column:
    """Salt in ``[0, n_salt)`` hashed from the FULL row content —
    deterministic, so a retried task re-salts identically
    (bit-reproducible partitioned output), unlike
    monotonically_increasing_id which re-numbers on retry. Hashing only
    the join key would be useless (one salt per hot key); full-row
    content spreads a hot key across salts as long as any other column
    varies, and identical duplicate rows co-locating is
    correctness-neutral."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side's hot
    keys spread over ``n_salt`` sub-keys. Result equals
    ``big.join(small, key, how)`` for how ∈ {inner, left}."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt")
    big_s = big.withColumn("_salt", content_salt(big, n_salt))
    small_s = small.select("*", salts)
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame, keys: list[str], value: str, n_salt: int = 16
) -> DataFrame:
    """Exact ``COUNT(DISTINCT value)`` per ``keys`` in two stages with
    bounded per-task state. Hash-partitioning the VALUE space makes the
    stage-1 partial counts disjoint, hence additive in stage 2."""
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt)).alias("_salt")
    partial = (
        df.select(*keys, F.col(value), salt)
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(value).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial").alias(f"n_distinct_{value}"))
    )
