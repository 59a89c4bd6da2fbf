"""Structured Streaming forms of the event operators.

The reference is strictly batch (SURVEY §2.13), and the engine's batch
operators (pipeline/events.py) are the source of truth; these wrappers
run the same aggregations as incremental streaming queries so a live
event feed and a backfill produce identical rows:

* ``stream_minute_rollup`` — tumbling 1-minute window + watermark; emits
  the same (minute_ep, event_type, n_events, value_sum) rows as the
  batch ``minute_rollup`` once windows close.
* ``stream_sessionize`` — gap-based session windows
  (``F.session_window``), the streaming analog of the batch
  ``sessionize`` (same gap semantics; session ids differ by design:
  batch numbers sessions per user, streaming keys them by start time).

Both are stateful aggregations: state is keyed by (window, user/type),
watermarks bound it, and the sink sees append-mode finalized rows —
the standard production shape for late-data-tolerant rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_minute_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling per-minute counts/sums over a streaming event frame."""
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # cast preserves instants
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 minute").alias("w"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("minute_ep"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation over a streaming event frame."""
    gap = f"{gap_seconds} seconds"
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.unix_timestamp(F.col("w.start")).alias("t_start"),
            F.unix_timestamp(F.col("w.end")).alias("t_end"),
            "n_events",
        )
    )
