"""Neighborhood feature aggregation — the GraphSAGE-style prep pass
(Hamilton, Ying & Leskovec, NeurIPS 2017 §3.1, public): for every
vertex, element-wise MEAN and MAX of its neighbors' feature vectors,
optionally concatenated with its own — the one-hop aggregation every
message-passing model's data loader needs, as a bulk Spark pass
instead of a per-minibatch sampler.

Scale shape at 100 TB: ONE edges⋈features join + ONE map-side-combined
aggregation carrying d sum-accumulators, d max-accumulators and a
count — the pagerank superstep with 2d+1 accumulators; dims ≤ 64
guarded (the fastrp.py discipline — the per-dim aggregate list is
unrolled into the plan).  No iteration; stack calls for k-hop
receptive fields (each hop is one pass over the PREVIOUS output).

Cross-engine exactness: with integer-valued input features (degree
counts, egonet counts, …) the mean is one BIGINT-sum / BIGINT-count
double division and the max is pure selection — bit-identical in any
engine.  Float features inherit the usual sum-order caveat on the
mean (round at the sink).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.kcore import undirected_simple

MAX_DIMS = 64


@dataclass
class NeighborFeaturesResult:
    features: DataFrame  # (vertex, n_neighbors, mean array, max array)
    dims: int


def aggregate_neighbor_features(
    edges: DataFrame,
    features: DataFrame,
    dims: int,
    vec_col: str = "features",
    include_self: bool = False,
) -> NeighborFeaturesResult:
    """Element-wise mean and max of neighbor feature vectors over the
    undirected simple graph spanned by ``edges``.  ``features`` maps
    vertex → ``vec_col`` (array<double>, exactly ``dims`` wide —
    enforced by the unrolled projection: short arrays raise at run
    time under ANSI mode).  ``include_self=True`` adds the vertex's
    own vector to its neighborhood (the GCN convention); default is
    neighbors-only (the GraphSAGE convention).  Vertices of the graph
    missing from ``features`` contribute nothing and come out with
    n_neighbors counting only FEATURED neighbors."""
    if dims < 1 or dims > MAX_DIMS:
        raise ValueError(
            f"aggregate_neighbor_features: dims must be in [1, {MAX_DIMS}], "
            f"got {dims}"
        )
    und = undirected_simple(edges)
    feat = features.select(
        F.col(features.columns[0]).alias("nbr"),
        *[
            F.col(vec_col)[i].cast("double").alias(f"f{i}")
            for i in range(dims)
        ],
    )
    msgs = und.select(
        F.col("a").alias("vertex"), F.col("b").alias("nbr")
    ).join(feat, "nbr")
    if include_self:
        self_rows = feat.select(
            F.col("nbr").alias("vertex"),
            F.col("nbr"),
            *[F.col(f"f{i}") for i in range(dims)],
        )
        msgs = msgs.unionByName(self_rows)
    agg = msgs.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        *[F.sum(f"f{i}").alias(f"s{i}") for i in range(dims)],
        *[F.max(f"f{i}").alias(f"m{i}") for i in range(dims)],
    )
    out = agg.select(
        "vertex",
        "n_neighbors",
        F.array(
            *[(F.col(f"s{i}") / F.col("n_neighbors")) for i in range(dims)]
        ).alias("mean"),
        F.array(*[F.col(f"m{i}") for i in range(dims)]).alias("max"),
    )
    return NeighborFeaturesResult(features=out, dims=dims)
