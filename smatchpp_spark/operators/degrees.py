"""Degree tables — the cornerstone of triangle counting, skew handling and
the reentrancy operator.

Reference semantics: ``util.n_incoming``/``n_outgoing``
(smatchpp/util.py:107-138) count *every* edge into/out of a node; the
reentrancy subgraph (smatchpp/subgraph_extraction.py:60-74) keeps
non-instance triples whose target is a variable with in-degree > 1.

Scale notes: ``degrees`` computes in- and out-degree in ONE shuffle (a
union of the two endpoint projections followed by a single partial+final
aggregation).  At web scale the aggregation is map-side combined by
Catalyst, so hub vertices cost one row per partition, not one per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    return edges.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def in_degrees(edges: DataFrame, dst: str = "dst") -> DataFrame:
    return edges.groupBy(F.col(dst).alias("vertex")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(vertex, in_deg, out_deg) in a single shuffle via endpoint union."""
    ends = edges.select(
        F.col(src).alias("vertex"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionByName(
        edges.select(F.col(dst).alias("vertex"), F.lit(0).alias("o"), F.lit(1).alias("i"))
    )
    return ends.groupBy("vertex").agg(
        F.sum("i").alias("in_deg"), F.sum("o").alias("out_deg")
    )


def graph_degrees(edges: DataFrame) -> DataFrame:
    """Per-graph node degrees for the smatchpp edge table
    (graph_id, src, rel, dst): every edge counts, instance edges included
    (util.py:107-138 counts all triples)."""
    ends = edges.select(
        "graph_id", F.col("src").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionByName(
        edges.select(
            "graph_id", F.col("dst").alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i")
        )
    )
    return ends.groupBy("graph_id", "node").agg(
        F.sum("i").alias("in_deg"), F.sum("o").alias("out_deg")
    )


def reentrancies(edges: DataFrame) -> DataFrame:
    """Non-instance triples whose target is a variable with in-degree > 1.

    Joins per-graph in-degree and the variable table back to the edges —
    two broadcast-able small sides at per-graph granularity, expressed as
    plain equi-joins so Catalyst picks the physical strategy.
    """
    variables = edges.filter(F.col("rel") == ":instance").select(
        "graph_id", F.col("src").alias("node")
    ).distinct()
    indeg = (
        edges.groupBy("graph_id", F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).alias("in_deg"))
        .filter(F.col("in_deg") > 1)
    )
    reentrant_vars = indeg.join(variables, ["graph_id", "node"], "left_semi")
    return (
        edges.filter(F.col("rel") != ":instance")
        .join(
            reentrant_vars.withColumnRenamed("node", "dst"),
            ["graph_id", "dst"],
            "left_semi",
        )
        .select("graph_id", "pos", "src", "rel", "dst")
    )
