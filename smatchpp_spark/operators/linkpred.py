"""Neighborhood-overlap link prediction over the undirected edge table.

Common-neighbors / Adamic-Adar / resource-allocation scoring of
non-adjacent vertex pairs — the classic "which link forms next"
primitives (Liben-Nowell & Kleinberg 2003; Adamic & Adar 2003, public
algorithms).  Beyond the reference's operator set, same contract style
as its graph_transforms.py operators.

Plan shape (the same skew discipline as triangle counting,
triangles.py): candidate pairs are generated through a WEDGE JOIN on the
shared neighbor z — never an all-pairs product.  A hub pivot z
contributes d(z)² candidate pairs, so ``max_pivot_degree`` drops
super-hub pivots from scoring (standard practice: a 10^6-degree hub's
1/log(10^6) contribution is negligible per pair but its wedge set is
quadratic — the cap bounds work with measurable score error, and
Adamic-Adar/RA weights make the dropped contributions the smallest
ones).  Everything else is one groupBy on the pair key plus one
anti-join against the existing edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.kcore import undirected_simple


def linkpred_scores(
    edges: DataFrame,
    method: str = "adamic_adar",
    top_k: int | None = None,
    max_pivot_degree: int | None = None,
    exclude_existing: bool = True,
) -> DataFrame:
    """Score candidate pairs by shared-neighborhood weight.

    ``method``: ``common_neighbors`` (weight 1 per shared z),
    ``adamic_adar`` (1/ln d(z)), or ``resource_allocation`` (1/d(z)).
    Output (u, v, score double) with u < v; ``top_k`` keeps the global
    best pairs (ties by u, v — deterministic); ``exclude_existing``
    anti-joins pairs already linked.  Pivots with degree < 2 generate no
    wedges and pivots above ``max_pivot_degree`` are dropped (see module
    docstring).
    """
    if method not in ("common_neighbors", "adamic_adar", "resource_allocation"):
        raise ValueError(f"unknown link-prediction method {method!r}")
    und = undirected_simple(edges)  # (a, b), both directions, distinct
    deg = und.groupBy(F.col("a").alias("z")).agg(
        F.count(F.lit(1)).alias("dz")
    )
    if method == "common_neighbors":
        wcol = F.lit(1.0)
    elif method == "adamic_adar":
        # d(z) == 1 pivots generate no wedge; d(z) ≥ 2 ⟹ ln d(z) > 0
        wcol = 1.0 / F.log(F.col("dz").cast("double"))
    else:
        wcol = 1.0 / F.col("dz").cast("double")

    pivots = deg.filter(F.col("dz") >= 2)
    if max_pivot_degree is not None:
        pivots = pivots.filter(F.col("dz") <= max_pivot_degree)
    nbrs = und.select(F.col("a").alias("z"), F.col("b").alias("n")).join(
        pivots, "z"
    )
    e1 = nbrs.select("z", F.col("n").alias("u"), wcol.alias("w"))
    e2 = nbrs.select("z", F.col("n").alias("v"))
    pairs = (
        e1.join(e2, "z")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.round(F.sum("w"), 9).alias("score"))
    )
    if exclude_existing:
        canon = und.filter(F.col("a") < F.col("b")).select(
            F.col("a").alias("u"), F.col("b").alias("v")
        )
        pairs = pairs.join(canon, ["u", "v"], "left_anti")
    if top_k is not None:
        # global top-k: per-partition prune would also work, but orderBy
        # + limit already runs as TakeOrderedAndProject (no full sort
        # materialization) — the right plan at any scale
        pairs = pairs.orderBy(F.desc("score"), F.asc("u"), F.asc("v")).limit(
            top_k
        )
    return pairs
