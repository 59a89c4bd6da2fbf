"""4-clique counting and clique-percolation (CPM, k=3) communities.

Both build on the degree-orientation discipline of
``operators/triangles.py``: orient every undirected edge from the
lower-(degree, id) endpoint to the higher one, so hub vertices are the
*targets* of their edges and the per-pivot fan-out is bounded by
d_out ≤ √(2m).  Within any clique the orientation (a restriction of a
global linear order) is transitive, so every k-clique materializes
exactly once as the ordered tuple of its vertices — no post-hoc
dedup, no double counting.

4-clique plan (k-clique listing à la Danisch et al., WWW'18, expressed
as equi-joins): oriented triangles (u→v, u→w, v→w) extend by one more
oriented out-edge w→x, then two verify joins (v→x, u→x) against the
oriented edge set.  Every join is a plain equi-join on a key the
orientation already bounds; nothing pivots on a raw hub degree.

Clique percolation (Palla et al., Nature 2005; k=3): two triangles are
adjacent iff they share an edge; communities are connected components
of that triangle graph.  The edge-bucket STAR trick keeps it linear:
instead of all-pairs within an edge's triangle bucket (quadratic in
bucket size — a hub edge can sit in thousands of triangles), connect
every triangle in the bucket to the bucket's minimum triangle id.
Star edges preserve connectivity exactly and cost one row per
(edge, triangle) incidence.  Components run the O(log n)-round
two-phase large-star/small-star algorithm to the FIXPOINT (star graphs
inherit long min-label chains from the underlying graph, so hash-min's
O(diameter) supersteps would dominate; measured on the %19-sparsified
co-purchase graph hash-min was still unconverged at 24 supersteps).
The converged fixpoint is order-invariant, so the oracle is DuckDB's
recursive transitive closure — the same contract as the house
``connected_components`` rows.

Degree semantics anchor to the reference's degree filters
(smatchpp/util.py:107-138); the triangle substrate is shared with
operators/triangles.py (differentially tested against brute force).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.components import two_phase_components
from smatchpp_spark.operators.triangles import _canonical_undirected, oriented_edges


@dataclass
class FourCliqueResult:
    per_vertex: DataFrame  # (vertex, four_cliques)
    total: int


def oriented_triangles(edges: DataFrame) -> DataFrame:
    """Triangles as (u, v, w): u is the orientation-minimum corner,
    v < w by id (the same shape as triangles._count_wedges, but keeping
    all three corner columns).  Each triangle exactly once."""
    oriented = oriented_edges(edges)
    canonical = _canonical_undirected(edges)
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    return wedges.join(
        canonical,
        (F.col("v") == F.col("a")) & (F.col("w") == F.col("b")),
        "inner",
    ).select("u", "v", "w")


def four_clique_count(
    edges: DataFrame, num_partitions: int | None = None
) -> FourCliqueResult:
    """Count 4-cliques per vertex (and in total).

    Every 4-clique {a,b,c,d} (orientation order a<b<c<d) is generated
    exactly once: from its unique all-oriented triangle (a,b,c), the
    extension x=d is a candidate out of ONE corner's out-edges and two
    verify equi-joins demand the other two oriented edges — only the
    orientation-maximum vertex survives all three.  Candidate volume is
    Σ_triangles d_out(corner) with d_out ≤ √(2m); the verify joins
    shrink, never grow.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    oriented = oriented_edges(edges).persist()
    canonical = _canonical_undirected(edges)
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    tri = (
        e1.join(e2, "u")
        .filter(F.col("v") < F.col("w"))
        .join(
            canonical,
            (F.col("v") == F.col("a")) & (F.col("w") == F.col("b")),
            "inner",
        )
        .select("u", "v", "w")
    )
    # generate from w, verify against v then u — all plain equi-joins
    o_w = oriented.select(F.col("lo").alias("w"), F.col("hi").alias("x"))
    o_v = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("x"))
    o_u = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("x"))
    four = (
        tri.repartition(num_partitions, "w")
        .join(o_w, "w")
        .join(o_v, ["v", "x"])
        .join(o_u, ["u", "x"])
    )
    # one explode pass for the four corners (a union-of-projections
    # would duplicate the three-join subtree four times)
    per_vertex = (
        four.select(
            F.explode(F.array("u", "v", "w", "x")).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("four_cliques"))
        .localCheckpoint()
    )
    oriented.unpersist()
    row = per_vertex.agg(
        (F.coalesce(F.sum("four_cliques"), F.lit(0)) / 4).alias("t")
    ).collect()[0]
    return FourCliqueResult(per_vertex=per_vertex, total=int(row["t"]))


@dataclass
class CliquePercolationResult:
    membership: DataFrame  # (vertex, community) — overlapping allowed
    communities: DataFrame  # (tid, community) per triangle
    supersteps: int
    converged: bool


def clique_percolation(
    edges: DataFrame,
    max_supersteps: int = 16,
    num_partitions: int | None = None,
) -> CliquePercolationResult:
    """k=3 clique-percolation communities (overlapping — a vertex sits
    in every community one of its triangles belongs to).

    Triangle node id is the canonical 'v1|v2|v3' string (corners sorted
    by id); community id is the minimum triangle id in the percolation
    component — the two-phase large-star/small-star fixpoint over the
    edge-bucket star graph (``max_supersteps`` caps the rounds; check
    ``converged``).  The star graph preserves the percolation
    connectivity of the quadratic triangle-adjacency graph at one row
    per (shared-edge, triangle) incidence.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    tri = oriented_triangles(edges)
    sorted_corners = F.array_sort(F.array("u", "v", "w"))
    tri_id = tri.select(
        F.concat_ws("|", sorted_corners).alias("tid"),
        sorted_corners[0].alias("n1"),
        sorted_corners[1].alias("n2"),
        sorted_corners[2].alias("n3"),
    ).persist()

    # the three undirected edges of each triangle, id-canonical
    pair_edges = tri_id.select(
        "tid",
        F.explode(
            F.array(
                F.struct(F.col("n1").alias("a"), F.col("n2").alias("b")),
                F.struct(F.col("n1").alias("a"), F.col("n3").alias("b")),
                F.struct(F.col("n2").alias("a"), F.col("n3").alias("b")),
            )
        ).alias("e"),
    ).select("tid", "e.a", "e.b")

    # star: every triangle in an edge bucket links to the bucket minimum
    hubs = pair_edges.groupBy("a", "b").agg(F.min("tid").alias("hub"))
    star = (
        pair_edges.join(hubs, ["a", "b"])
        .filter(F.col("tid") != F.col("hub"))
        .select(F.col("tid").alias("src"), F.col("hub").alias("dst"))
    )

    cc = two_phase_components(
        star, max_rounds=max_supersteps, num_partitions=num_partitions
    )
    communities = cc.components.select(
        F.col("vertex").alias("tid"), F.col("component").alias("community")
    )
    # isolated triangles (no shared edge with any other triangle) form
    # singleton communities keyed by their own tid
    lone = tri_id.join(
        communities, tri_id["tid"] == communities["tid"], "left_anti"
    ).select("tid", F.col("tid").alias("community"), "n1", "n2", "n3")
    member_src = tri_id.join(communities, "tid").unionByName(lone)
    membership = (
        member_src.select(
            F.explode(F.array("n1", "n2", "n3")).alias("vertex"), "community"
        )
        .distinct()
        .localCheckpoint()
    )
    tri_id.unpersist()
    all_comms = communities.unionByName(
        lone.select("tid", "community")
    )
    return CliquePercolationResult(
        membership=membership,
        communities=all_comms,
        supersteps=cc.supersteps,
        converged=cc.converged,
    )
