"""4-node graphlet census: non-induced subgraph counts via counting
identities (the ESCAPE decomposition, Pinar-Seshadhri-Vishal WWW'17,
public), so only TWO heavy primitives are ever enumerated — triangles
and 4-cliques, both via the degree-oriented joins of
operators/triangles.py and operators/cliques.py — and everything else
is a per-vertex / per-edge / per-pair aggregation:

  * wedges (path-2)        W  = Σ_v C(d_v, 2)
  * triangles              T  (degree-oriented wedge join, shared impl)
  * 3-stars (claws)        S3 = Σ_v C(d_v, 3)
  * 4-paths (path-3)       P4 = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·T
      (walks u'-u-v-v' minus the 3 per-triangle degenerate closures)
  * tailed triangles       TT = Σ_v t_v · (d_v − 2)
      (a triangle corner times a non-triangle pendant edge)
  * 4-cycles               C4 = Σ_{u, v ≺ u} C(w_u(u,v), 2)
      (Chiba–Nishizeki ordering: every 4-cycle is counted exactly once
      at its (degree,id)-MAX vertex u paired with u's diagonal
      opposite v, via wedges u−a−v whose center AND far endpoint both
      precede u; wedges whose order-max is the CENTER are never
      enumerated, which is what keeps a star/hub free — the total
      enumeration is Σ_a d(a)·d_out(a) ≤ √(2m)·2m, the triangles
      bound, instead of the Σ C(d_a, 2) wedge explosion of the naive
      ½·Σ C(codeg, 2) diagonal formula)
  * diamonds               D  = Σ_{e∈E} C(t_e, 2)
      (pairs of triangles sharing edge e; per-edge supports reuse the
      k-truss explode)
  * 4-cliques              K4 (oriented extend + two verify joins)

Counts are NON-induced (each smaller pattern embeds in larger ones —
the standard ESCAPE contract; induced counts are an invertible linear
combination the caller can apply driver-side).  Output is one row, so
the whole census collapses to a handful of map-side-combined
aggregations over the oriented-join outputs — nothing quadratic, no
per-vertex windows, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.cliques import four_clique_count, oriented_triangles
from smatchpp_spark.operators.triangles import _canonical_undirected, oriented_edges


def graphlet_census(edges: DataFrame) -> DataFrame:
    """One row: (n_vertices, n_edges, wedges, triangles, three_stars,
    four_paths, tailed_triangles, four_cycles, diamonds, four_cliques)
    over the undirected simple graph spanned by ``edges``."""
    canonical = _canonical_undirected(edges).localCheckpoint(eager=True)
    deg = (
        canonical.select(F.col("a").alias("v"))
        .unionByName(canonical.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    # all counts use integral `div`, never float `/` — C(d,2) sums at
    # 10^12-edge scale overflow double's 2^53 integer range long before
    # they trouble a BIGINT
    base = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.expr("sum(CAST(d AS BIGINT)) div 2").alias("n_edges"),
        F.expr(
            "sum(CAST(d AS BIGINT) * (d - 1) div 2)"
        ).alias("wedges"),
        F.expr(
            "sum(CAST(d AS BIGINT) * (d - 1) * (d - 2) div 6)"
        ).alias("three_stars"),
    )

    # triangles: per-vertex corners and per-edge supports from ONE
    # oriented-triangle materialization (corners sum = 3T)
    tri = oriented_triangles(edges).localCheckpoint(eager=True)
    corner = F.explode(F.array("u", "v", "w")).alias("v")
    tri_v = tri.select(corner).groupBy("v").agg(
        F.count(F.lit(1)).alias("t_v")
    )
    t_total = tri_v.agg(
        F.expr("coalesce(sum(t_v), 0) div 3").alias("triangles")
    )
    # tailed triangles: Σ_v t_v (d_v − 2)
    tailed = (
        tri_v.join(deg, "v")
        .agg(
            F.coalesce(
                F.sum(F.col("t_v") * (F.col("d").cast("long") - 2)), F.lit(0)
            )
            .cast("long")
            .alias("tailed_triangles")
        )
    )
    # diamonds: per-edge triangle supports (three canonical edges per
    # triangle — the k-truss explode), then Σ_e C(t_e, 2)
    edge_pairs = F.array(
        F.struct(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")),
        F.struct(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")),
        F.struct(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")),
    )
    t_e = (
        tri.select(F.explode(edge_pairs).alias("e"))
        .groupBy("e.a", "e.b")
        .agg(F.count(F.lit(1)).alias("t_e"))
    )
    diamonds = t_e.agg(
        F.expr(
            "coalesce(sum(t_e * (t_e - 1) div 2), CAST(0 AS BIGINT))"
        ).alias("diamonds")
    )

    # 4-paths: Σ_{(a,b)∈E} (d_a−1)(d_b−1) − 3T (3T folded in below)
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    walk3 = (
        canonical.join(da, "a")
        .join(db, "b")
        .agg(
            F.coalesce(
                F.sum(
                    (F.col("da").cast("long") - 1)
                    * (F.col("db").cast("long") - 1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("walk3")
        )
    )

    # 4-cycles (Chiba–Nishizeki): wedges u−a−v enumerated ONLY when u
    # is the strict (degree,id)-max of all three vertices — join u's
    # below-u neighbors a (= the oriented in-edges a→u) with a's full
    # adjacency, keep v ≺ u; then per (u, v) wedge counts and
    # Σ C(w, 2).  Every 4-cycle has a unique order-max vertex and that
    # vertex is an ENDPOINT of exactly the two wedges through its
    # diagonal, so each cycle lands once; wedges centered at an
    # order-max hub are never generated.
    oriented = oriented_edges(edges)  # (lo, hi) by (degree, id)
    und = canonical.unionByName(
        canonical.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    du = deg.select(F.col("v").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))
    wedges_at_max = (
        oriented.select(F.col("hi").alias("u"), F.col("lo").alias("a"))
        .join(und.select(F.col("a"), F.col("b").alias("y")), "a")
        .filter(F.col("y") != F.col("u"))
        .join(du, "u")
        .join(dv, "y")
        .filter(
            (F.col("dy") < F.col("du"))
            | ((F.col("dy") == F.col("du")) & (F.col("y") < F.col("u")))
        )
    )
    c4 = (
        wedges_at_max.groupBy("u", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.expr(
                "coalesce(sum(c * (c - 1) div 2), CAST(0 AS BIGINT))"
            ).alias("four_cycles")
        )
    )

    k4 = four_clique_count(edges).total

    out = (
        base.crossJoin(t_total)
        .crossJoin(tailed)
        .crossJoin(walk3)
        .crossJoin(c4)
        .crossJoin(diamonds)
        .select(
            "n_vertices",
            "n_edges",
            "wedges",
            "triangles",
            "three_stars",
            (F.col("walk3") - 3 * F.col("triangles")).alias("four_paths"),
            "tailed_triangles",
            "four_cycles",
            "diamonds",
            F.lit(k4).cast("long").alias("four_cliques"),
        )
    )
    return out
