"""Partitioning-independent dense indexing without a global window.

``dense_index`` assigns ``out_col`` = a dense 0..n-1 index over the whole
DataFrame, ordered by (group_col, order_col), using per-group
row_numbers plus cumulative group-count offsets (the group spine is tiny
— one row per group — and broadcasts back).  No single-partition window
ever sees the full table, so the pattern scales and is deterministic for
any physical partitioning as long as (group_col, order_col) is."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_index(
    df: DataFrame,
    group_col: str,
    order_col: str,
    out_col: str = "i",
) -> DataFrame:
    w_rn = Window.partitionBy(group_col).orderBy(order_col)
    rn = df.withColumn("_rn", F.row_number().over(w_rn) - 1)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy(group_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        group_col, F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        rn.join(F.broadcast(offsets), group_col)
        .withColumn(out_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_rn", "_off")
    )
