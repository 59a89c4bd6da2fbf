"""Ego-network features per vertex — the OddBall anomaly surface.

For each vertex v of the undirected simple graph, the EGONET is the
subgraph induced on {v} ∪ N(v).  Its two defining counts come for free
from machinery the engine already owns:

    ego_nodes(v) = deg(v) + 1
    ego_edges(v) = deg(v) + triangles(v)

(each spoke v–u is one ego edge; each edge between two neighbors of v
closes a triangle through v, and every triangle through v is exactly
one such edge — so no new joins beyond the degree agg and the
degree-oriented triangle count of triangles.py).

OddBall (Akoglu, McGlohon & Faloutsos, PAKDD 2010, public) flags
anomalies by where (ego_nodes, ego_edges) falls against the power-law
most vertices obey: near-cliques have ego_edges ≈ n², near-stars
ego_edges ≈ n − 1.  The engine emits the exact integer counts plus the
scale-free ratio ``edge_ratio = ego_edges / ego_nodes`` (λ in the
paper); fitting/thresholding is a downstream 2-column regression the
caller can do on the (tiny) feature table.

Scale shape at 100 TB: the feature table is one degree agg (map-side
combined) plus the per-vertex corner counts of the degree-oriented
wedge join — both already bounded by Σd_lo² with d_lo ≤ √(2m)
(triangles.py orientation).  No new shuffle beyond one vertex-keyed
left join.  Integer outputs ⇒ the DuckDB oracle compares exactly.

Beyond the reference's operator set (its graphs are 20-node AMRs);
contract style follows operators/graphstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.triangles import (
    _canonical_undirected,
    oriented_edges,
    _count_wedges,
)


def egonet_features(edges: DataFrame) -> DataFrame:
    """(vertex, degree, triangles, ego_nodes, ego_edges, edge_ratio)
    for every vertex of the undirected simple graph spanned by
    ``edges`` (direction/multiplicity ignored, self-loops dropped).
    ``edge_ratio`` is rounded to 9 places; the counts are exact."""
    spark = edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    canonical = _canonical_undirected(edges).persist()
    deg = (
        canonical.select(F.col("a").alias("vertex"))
        .unionByName(canonical.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    oriented = (
        oriented_edges(edges).repartition(num_partitions, "lo").persist()
    )
    tri = _count_wedges(oriented, canonical)
    oriented.unpersist()
    out = (
        deg.join(tri, "vertex", "left")
        .select(
            "vertex",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            (F.col("degree") + F.lit(1)).alias("ego_nodes"),
            (F.col("degree") + F.coalesce("triangles", F.lit(0))).alias(
                "ego_edges"
            ),
        )
        .withColumn(
            "edge_ratio",
            F.round(F.col("ego_edges") / F.col("ego_nodes"), 9),
        )
    )
    canonical.unpersist()
    return out
