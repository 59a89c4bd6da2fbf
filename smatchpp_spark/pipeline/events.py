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


def parse_props(
    events: DataFrame,
    schema: str = "k BIGINT",
    props_col: str = "props",
) -> DataFrame:
    """Typed extraction of the semi-structured ``props`` JSON column.

    ``from_json`` with an explicit schema keeps the whole extraction
    JVM-side inside whole-stage codegen (one pass, no Python); malformed
    or missing JSON yields NULL fields, never an error (PERMISSIVE mode
    — the only sane contract at 10^12-row scale where some fraction of
    payloads is always garbage).  Extracted fields are appended as
    top-level columns named after the schema fields.
    """
    parsed = events.withColumn("_p", F.from_json(F.col(props_col), schema))
    fields = [f.strip().split()[0] for f in schema.split(",")]
    out = events.columns + [
        F.col(f"_p.{f}").alias(f) for f in fields if f not in events.columns
    ]
    return parsed.select(*out)


def props_rollup(
    events: DataFrame,
    key_field: str = "k",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-event-type rollup over a JSON-extracted integer property.

    Output: ``(event_type, n_events, n_missing, sum_k, min_k, max_k,
    n_distinct_k, sum_value)``.  ``n_missing`` counts rows whose props
    JSON is absent, malformed, or lacks the field.  ``sum_value`` is an
    exact DECIMAL(12,2) sum cast to double at the very end, so the
    result is bit-identical across engines and partitionings (no
    float-accumulation order dependence).

    Scale shape: one scan + one map-side-combinable aggregation keyed
    by event type; the JSON parse is a codegen projection, never a UDF.
    """
    p = parse_props(events, f"{key_field} BIGINT")
    k = F.col(key_field)
    return (
        p.groupBy(F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(k.isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.countDistinct(k).alias("n_distinct_k"),
            F.sum(F.col(value_col).cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
