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


def egonet_anomalies(edges: DataFrame) -> DataFrame:
    """OddBall anomaly scores (Akoglu et al. PAKDD 2010 §3, public):
    fit the ego power law ``ego_edges ≈ C · ego_nodes^θ`` by ordinary
    least squares in log-log space (one moment aggregation — the
    degree_assortativity pattern), then score every vertex by the
    paper's out-of-line measure

        score(v) = (max(y, ŷ) / min(y, ŷ)) · ln(|y − ŷ| + 1)

    with y = ego_edges and ŷ = C·ego_nodes^θ — distance from the fit
    in both ratio and absolute terms, so near-cliques AND near-stars
    surface regardless of size.

    Scale shape: egonet_features (degree agg + oriented wedge corners)
    + ONE two-column moment aggregation (map-side combined, 1 row to
    the driver as plan literals) + a stateless scoring projection — no
    new joins.  Output: (vertex, ego_nodes, ego_edges, expected_edges,
    score), floats rounded 6 at the sink (moment-sum ulp noise
    amplified through exp reaches ~1e-10 at yhat ≈ 10³, so round-9
    flipped 101/2000 rows cross-engine; round-6 absorbs it).

    Single-vertex-degenerate guard: a fit needs ≥ 2 distinct
    ego_nodes values and positive variance; otherwise raises (a
    regular graph has no out-of-line notion).
    """
    feats = egonet_features(edges).localCheckpoint(eager=True)
    lx = F.log(F.col("ego_nodes").cast("double"))
    ly = F.log(F.col("ego_edges").cast("double"))
    mom = (
        feats.select(lx.alias("x"), ly.alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
        .collect()[0]
    )
    n, sx, sy, sxx, sxy = (
        float(mom["n"]), float(mom["sx"]), float(mom["sy"]),
        float(mom["sxx"]), float(mom["sxy"]),
    )
    var = sxx / n - (sx / n) * (sx / n)
    if n < 2.0 or var <= 0.0:
        raise ValueError(
            "egonet_anomalies: the log-log fit needs >= 2 vertices with "
            "distinct ego sizes (zero variance — a regular graph has no "
            "out-of-line notion)"
        )
    theta = (sxy / n - (sx / n) * (sy / n)) / var
    logc = sy / n - theta * (sx / n)
    yhat = F.exp(
        F.lit(logc) + F.lit(theta) * F.log(F.col("ego_nodes").cast("double"))
    )
    y = F.col("ego_edges").cast("double")
    score = (
        F.greatest(y, yhat) / F.least(y, yhat)
    ) * F.log(F.abs(y - yhat) + F.lit(1.0))
    return feats.select(
        "vertex",
        "ego_nodes",
        "ego_edges",
        F.round(yhat, 6).alias("expected_edges"),
        F.round(score, 6).alias("score"),
    )
