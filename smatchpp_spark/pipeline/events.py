"""Event-stream batch operators: sessionization and time-window rollups.

The reference is strictly batch (SURVEY §2.13), so the engine's
"streaming" surface is batch-over-event-log: the same window semantics a
Structured Streaming job would use, expressed as DataFrame windows so
they run identically in a backfill and (wrapped in ``readStream``) in a
live pipeline.

Scale shapes: sessionization shuffles once on ``user_id`` (the window
partition key); the rollup is a single partial+final aggregation on the
(minute, event_type) composite key — uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_seconds``.

    Output: (session_id, user_id, n_events, t_start, t_end) with epoch
    seconds for the bounds.  Deterministic: events are ordered by
    (ts, event_id) inside each user partition.
    """
    ep = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy("ep", id_col)
    marked = events.select(
        user_col, id_col, ep.alias("ep")
    ).withColumn(
        "new_session",
        F.when(
            F.lag("ep").over(w).isNull()
            | ((F.col("ep") - F.lag("ep").over(w)) > gap_seconds),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_no", F.sum("new_session").over(w))
    return marked.groupBy(
        F.concat(
            F.col(user_col).cast("string"), F.lit("#"), F.col("session_no").cast("string")
        ).alias("session_id"),
        F.col(user_col),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ep").alias("t_start"),
        F.max("ep").alias("t_end"),
    )


def minute_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-(minute, event_type) counts and value sums — the batch form of
    a tumbling-window streaming aggregation."""
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("minute", F.col(ts_col))).alias("minute_ep"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("value_sum"),
        )
    )
