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
