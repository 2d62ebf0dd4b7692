"""Event-time windowed aggregations with watermarks.

The reference is batch-only; its hand-rolled micro-batching
(wikidata.py:206-213, wikipedia.py:165-172 in
/root/reference/scripts/wiki/) maps to Structured Streaming triggers.
Each operator here works on BOTH a streaming and a batch DataFrame —
the batch run is the oracle twin (Q23/Q24 in SURVEY.md §2.1), which is
how the tests keep event-time semantics honest without wall-clock
flakiness.

Late data: every streaming aggregation takes a watermark; rows older
than (max event time seen − delay) are dropped from state. State size
is bounded by (watermark horizon × key cardinality), which is the knob
that keeps these runnable against an unbounded 100 TB/day firehose.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark on streaming inputs; identity on batch twins (batch
    DataFrames have no watermark concept — semantics already exact)."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Events per (tumbling window × event_type). Batch twin: Q24
    (date_trunc when window == '1 hour')."""
    return (
        with_watermark(events, ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Events per sliding window per type; each row lands in
    window/slide overlapping windows."""
    return (
        with_watermark(events, ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session aggregation with a dynamic gap — the streaming
    form of Q23's gaps-and-islands. One row per (user, session):
    event count + session bounds."""
    return (
        with_watermark(events, ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful exact dedup bounded by the watermark horizon — the
    streaming form of Q25. Batch twin: plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def interval_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream INNER interval join (St7): attribute each purchase
    to same-user clicks at most ``max_lag`` before it. Works on both
    streaming inputs (watermarks required — they bound the join state:
    each side buffers only rows inside the watermark horizon, which is
    what keeps a double-firehose join runnable indefinitely) and batch
    twins (watermark is a no-op, semantics exact — the test oracle).

    The time-range predicate is the piece Spark needs to prune state:
    purchase.ts ∈ [click.ts, click.ts + max_lag] tells the engine when
    a buffered click can never match again and can be evicted. Without
    it a stream-stream join is unbounded state and Spark rejects it.

    Output: (user_id, click_id, purchase_id, click_ts, purchase_ts,
    lag_seconds, value) — one row per attributable (click, purchase).
    """
    c = with_watermark(clicks, ts_col, watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = with_watermark(purchases, ts_col, watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_lag}")
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_seconds"),
        "value",
    )
