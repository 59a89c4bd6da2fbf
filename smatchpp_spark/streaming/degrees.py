"""Custom stateful streaming operator: running vertex degrees over a
live edge stream, via ``applyInPandasWithState``.

This is the streaming form of ``operators/degrees.degrees`` (the batch
source of truth): every micro-batch of edges updates per-vertex
(in_deg, out_deg) counters held in Spark state store, and the operator
emits the updated totals — so a link-graph ingest pipeline can watch
degree distributions (hub detection, skew alarms) while edges arrive,
without re-scanning history.

Shape: edges explode to (vertex, i, o) increments JVM-side, then ONE
``groupBy(vertex).applyInPandasWithState`` — state is two longs per
vertex, updates are Arrow-batched and vectorized (``pdf.sum()``), no
per-row Python.  Counters are monotone, so any sink sees eventually-
consistent totals and the last update per vertex equals the batch
``degrees`` result (parity-tested in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEGREE_OUTPUT_SCHEMA = "vertex string, in_deg long, out_deg long"
DEGREE_STATE_SCHEMA = "in_deg long, out_deg long"


def _update_degrees(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    in_deg, out_deg = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        in_deg += int(pdf["i"].sum())
        out_deg += int(pdf["o"].sum())
    state.update((in_deg, out_deg))
    yield pd.DataFrame(
        {"vertex": [key[0]], "in_deg": [in_deg], "out_deg": [out_deg]}
    )


def stream_degrees(edges: DataFrame) -> DataFrame:
    """(src, dst) edge stream → per-vertex running (in_deg, out_deg)."""
    ends = edges.select(
        F.col("src").alias("vertex"), F.lit(0).alias("i"), F.lit(1).alias("o")
    ).unionByName(
        edges.select(
            F.col("dst").alias("vertex"), F.lit(1).alias("i"), F.lit(0).alias("o")
        )
    )
    return ends.groupBy("vertex").applyInPandasWithState(
        _update_degrees,
        DEGREE_OUTPUT_SCHEMA,
        DEGREE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Windowed trending vertices (streaming in-degree spikes)
# --------------------------------------------------------------------------

TREND_WINDOW = "1 minute"


def window_indegree(
    edges: DataFrame,
    ts_col: str = "ts",
    window: str = TREND_WINDOW,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Per-tumbling-window in-degree per destination vertex — the
    "trending links" primitive (which pages gained citations THIS
    minute, not cumulatively).

    Works on a batch OR streaming frame: with a streaming input pass a
    ``watermark`` (bounds state, finalizes windows, append sink); with a
    batch frame pass ``watermark=None`` — the aggregation is identical,
    which is the parity contract tested in tests/test_streaming.py.
    Top-k per window is a cheap post-sink rank (``trending_topk``): rank
    inside an unfinalized streaming window is not expressible in append
    mode, and ranking the sink keeps the streaming state to one counter
    per (window, vertex)."""
    edges = edges.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None:
        edges = edges.withWatermark(ts_col, watermark)
    return (
        edges.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("dst").alias("vertex"),
        )
        .agg(F.count(F.lit(1)).alias("in_deg"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_ep"),
            "vertex",
            "in_deg",
        )
    )


def trending_topk(window_counts: DataFrame, k: int = 10) -> DataFrame:
    """Top-k vertices by in-degree per window over a (window_ep, vertex,
    in_deg) frame (the sink of ``window_indegree``); deterministic ties
    by vertex id."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_ep").orderBy(
        F.desc("in_deg"), F.asc("vertex")
    )
    return (
        window_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("window_ep", "vertex", "in_deg", F.col("rk").alias("rank"))
    )
