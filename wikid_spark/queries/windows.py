"""Window layer: ranking, analytic, frame, sessionization, time buckets.

Q09–Q12, Q23, Q24 from SURVEY.md §2.1. The reference computes its one
windowed quantity (alias prior probabilities, __init__.py:218-223) as a
Python second pass over collected rows; here every windowed computation
is a Spark window spec — executor-side, spillable, one shuffle per
partitioning key reused across all window functions sharing the spec.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wikid_spark.catalog import table
from wikid_spark.registry import query


@query(
    "q09_ratio_to_report",
    oracle="""
    SELECT event_id,
           ROUND(value / GREATEST(SUM(value) OVER (PARTITION BY user_id), 1e-9), 4) AS ratio
    FROM events
    ORDER BY event_id
    LIMIT 1000
    """,
    tags=("window",),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report window [A5] — the reference's prior-probability
    normalization (count_i / Σcount per alias, __init__.py:218-223)
    expressed as a window aggregate instead of a driver-side pass."""
    ev = table(spark, sf_dir, "events")
    total = F.sum("value").over(Window.partitionBy("user_id"))
    return (
        ev.select(
            "event_id",
            F.round(F.col("value") / F.greatest(total, F.lit(1e-9)), 4).alias("ratio"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


@query(
    "q10_ranking_windows",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window", "topk"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking windows. One shuffle on o_custkey
    serves all three rank functions (same window spec)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q11_lag_analytic",
    oracle="""
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT)
             - CAST(floor(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
             AS secs_since_prev
    FROM events
    ORDER BY user_id, ts, event_id
    LIMIT 1000
    """,
    tags=("window", "analytic"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: integer seconds since the user's previous event
    (NULL for the first). Epoch values floored in both engines so the
    subtraction is exact integer arithmetic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
                "secs_since_prev"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(1000)
        .drop("ts")
    )


@query(
    "q12_rolling_frame",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rolling_sum
    FROM events
    ORDER BY user_id, ts, event_id
    LIMIT 1000
    """,
    tags=("window", "frame"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: rolling 3-event sum per user."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.sum("value").over(w), 4).alias("rolling_sum"),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(1000)
        .drop("ts")
    )


@query(
    "q23_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events
    FROM per_session GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "session", "streaming-twin"),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization — the batch twin of the
    streaming session window (30-minute gap). LAG flags session starts,
    a running SUM assigns session ids, two aggregations summarize.
    All three windows share the user_id partitioning → one shuffle."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0).alias("is_new"),
    )
    with_session = flagged.select(
        "user_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    per_session = with_session.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@query(
    "q24_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY 1, event_type
    ORDER BY hour, event_type
    """,
    tags=("window", "streaming-twin"),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch twin [streaming]: hourly event counts per
    type. The streaming version is F.window(ts, '1 hour') with a
    watermark (see wikid_spark.streaming); semantics identical.

    The grouped hour is emitted as a FORMATTED STRING (SURVEY §2.1
    determinism rules): raw timestamps are collected through the
    caller's process timezone and would shift vs the oracle's naive
    values under a non-UTC driver."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .orderBy("hour", "event_type")
    )


@query(
    "alias_priors",
    oracle="""
    WITH counts AS (
      SELECT event_type AS alias, user_id % 100 AS entity_id, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), priors AS (
      SELECT alias, entity_id,
             cnt / GREATEST(SUM(cnt) OVER (PARTITION BY alias), 1) AS prob
      FROM counts
    ), ranked AS (
      SELECT alias, entity_id, prob,
             ROW_NUMBER() OVER (PARTITION BY alias
                                ORDER BY prob DESC, entity_id DESC) AS rn
      FROM priors
    ), agg AS (
      SELECT alias, CAST(COUNT(*) AS BIGINT) AS n_entities,
             ROUND(SUM(prob), 6) AS sum_prob
      FROM priors GROUP BY alias
    )
    SELECT agg.alias, agg.n_entities,
           CAST(r.entity_id AS BIGINT) AS top_entity,
           ROUND(r.prob, 6) AS top_prob,
           agg.sum_prob
    FROM agg JOIN ranked r ON agg.alias = r.alias AND r.rn = 1
    ORDER BY agg.alias
    """,
    tags=("window", "agg"),
)
def alias_priors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5 end-to-end on synthetic tables: the reference's alias-prior
    pipeline (count per (alias, entity) -> ratio-to-total window ->
    per-alias sorted probability VECTOR, __init__.py:204-223) with
    events standing in for the alias table (alias=event_type,
    entity=user_id%100). The per-alias distribution is genuinely built
    as array_sort(collect_list(struct)) — the A4 group-to-vector shape —
    then flattened to scalar outputs (top entry, entry count, Σprob)
    because array-of-struct cells don't hash stably across engines.
    Σprob = 1 per alias is the A5 invariant the ratio window guarantees.
    """
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.col("event_type").alias("alias"),
        (F.col("user_id") % 100).alias("entity_id"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("alias")
    priors = counts.select(
        "alias",
        "entity_id",
        (F.col("cnt") / F.greatest(F.sum("cnt").over(w), F.lit(1))).alias(
            "prob"
        ),
    )
    vec = priors.groupBy("alias").agg(
        F.array_sort(F.collect_list(F.struct("prob", "entity_id"))).alias(
            "dist"
        )
    )
    top = F.element_at("dist", -1)
    return vec.select(
        "alias",
        F.size("dist").cast("long").alias("n_entities"),
        top.getField("entity_id").cast("long").alias("top_entity"),
        F.round(top.getField("prob"), 6).alias("top_prob"),
        F.round(
            F.aggregate(
                "dist", F.lit(0.0), lambda a, x: a + x.getField("prob")
            ),
            6,
        ).alias("sum_prob"),
    ).orderBy("alias")


@query(
    "q40_ntile_cume",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           NTILE(4) OVER w AS quartile,
           ROUND(CUME_DIST() OVER w, 4) AS cume,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("window", "distribution"),
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows — NTILE / CUME_DIST / PERCENT_RANK — the
    remaining SQL window-function family (ranking and frames are
    q10/q12). The ORDER BY inside the window is made total with the
    o_orderkey tiebreak, so tie handling can't diverge between engines.
    All three functions share ONE window spec → one shuffle + one sort,
    visible as a single Window node in the plan."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "q42_time_range_window",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep
      FROM events
    )
    SELECT event_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ep
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS trailing_1h
    FROM e
    ORDER BY event_id
    LIMIT 1000
    """,
    tags=("window", "frame", "timeseries"),
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per user, the trailing-one-hour sum of
    value — the sliding aggregate ROWS frames (q12) can't express,
    because how many rows fall in the hour varies per row. Ordering is
    on integer epoch seconds (the q11 idiom — floored identically in
    both engines), so frame bounds are exact integer comparisons and
    rows in the same second are peers on both sides, making the result
    order-independent. This is the batch twin of the streaming sliding
    window (St3): same frame semantics, expressed per-row instead of
    per-bucket."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            F.round(F.sum("value").over(w), 4).alias("trailing_1h"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


@query(
    "q47_running_distinct",
    oracle="""
    SELECT event_id,
           COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS distinct_types_so_far
    FROM events
    ORDER BY event_id
    LIMIT 1000
    """,
    tags=("window", "distinct"),
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user — how many distinct event types
    each user has touched so far. Spark has no COUNT(DISTINCT) window
    function; the idiom is size(collect_set() OVER w) — the set
    dedups inside the window buffer, so the expressible frame stays
    one pass over the partition. The window order is made total
    (ts, event_id) so both engines see identical frames."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            F.size(F.collect_set("event_type").over(w)).alias(
                "distinct_types_so_far"
            ),
        )
        .orderBy("event_id")
        .limit(1000)
    )
