"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming state machines (windowed aggs, session windows,
``dropDuplicatesWithinWatermark`` — streaming/windows.py) cover St2–St6;
this module is the St-family capstone: an arbitrary user-defined state
transition Spark has no built-in for. The example operator keeps
per-user running totals that survive across micro-batches and emits the
updated row each time the user appears — the streaming form of an
ever-growing ``groupBy`` without recomputing history.

Scale: state lives in the state store partitioned by the group key;
per-batch work is one shuffle on ``user_id`` plus an Arrow-batched
Python transition per updated key. State size is O(distinct users ×
one small tuple), the minimum any running aggregate needs.
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Must be pyspark's VENDORED cloudpickle (see operators/annotate.py):
# executors don't inherit the driver's sys.path for this package.
from pyspark import cloudpickle  # noqa: E402

cloudpickle.register_pickle_by_value(sys.modules[__name__])

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) that persists across
    micro-batches. Streaming input → ``applyInPandasWithState`` in
    update mode (each batch emits the new totals for users it touched);
    batch input → the equivalent one-shot aggregation, so callers can
    use one function for both (same pattern as dedup_within_watermark).
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
