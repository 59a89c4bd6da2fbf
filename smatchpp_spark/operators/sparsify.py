"""Edge embeddedness + local graph sparsification.

``edge_embeddedness`` scores every edge of the undirected simple graph
by the structure around it:

  support        |N(a) ∩ N(b)| — triangles through the edge, computed
                 with the degree-oriented wedge join of ktruss._support
                 (each triangle generated exactly once at its
                 two-out-edges corner; hub-skew bounded by Σ d_lo²,
                 d_lo ≤ √(2m))
  embeddedness   support / (min(d_a, d_b) − 1) — how much of the
                 smaller endpoint's neighborhood the edge shares
                 (Granovetter weak ties: 0 ⇒ a local bridge)
  nbr_jaccard    support / (d_a + d_b − 2 − support) — neighborhood
                 Jaccard, the ranking function of Satuluri et al.'s
                 local sparsification

``local_sparsify`` keeps, per vertex, its top-⌈d^e⌉ incident edges by
(nbr_jaccard, neighbor id) and unions over both endpoints (an edge
survives if EITHER endpoint ranks it) — Satuluri–Parthasarathy–Ruan
G-sparsify: community structure survives at a fraction of the edges.

Per-vertex top-k at hub scale: a naive row_number window puts a
10^8-degree hub's whole edge list in ONE sort partition (the hazard the
coreness H-index fix removed).  The selection here is two-phase: edges
are first salted into ⌈d / max_fanout⌉ buckets per endpoint and ranked
INSIDE each bounded bucket (window partitions ≤ max_fanout rows), only
the per-bucket top-k survive to the final exact window, whose input is
bounded by ⌈d/max_fanout⌉·k rows — for a 10^8-degree hub at the
defaults that is ~10^7 → 10^4·√10^8 ≈ 10^4× smaller than the naive
sort.  Both phases are plain map-side-prunable windows; counts stay
exact because phase 1 only discards edges that cannot be in the final
top-k of their bucket, a superset of the global top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smatchpp_spark.operators.ktruss import _support


def _canonical(edges: DataFrame) -> DataFrame:
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def edge_embeddedness(edges: DataFrame) -> DataFrame:
    """(a, b, support, embeddedness, nbr_jaccard) for every canonical
    edge (a < b) of the undirected simple graph; ratios rounded 9,
    degree-1 denominators guard to 0.0."""
    c = _canonical(edges).localCheckpoint(eager=False)
    deg = (
        c.select(F.col("a").alias("v"))
        .unionByName(c.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sup = _support(c)
    mn = F.least("da", "db") - 1
    un = F.col("da") + F.col("db") - 2 - F.col("support")
    return (
        c.join(sup, ["a", "b"], "left")
        .join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .withColumn("support", F.coalesce("support", F.lit(0)))
        .select(
            "a",
            "b",
            "support",
            F.when(mn <= 0, F.lit(0.0))
            .otherwise(F.round(F.col("support") / mn, 9))
            .alias("embeddedness"),
            F.when(un <= 0, F.lit(0.0))
            .otherwise(F.round(F.col("support") / un, 9))
            .alias("nbr_jaccard"),
        )
    )


def local_sparsify(
    edges: DataFrame,
    exponent: float = 0.5,
    max_fanout: int = 100_000,
) -> DataFrame:
    """Satuluri-style locally-sparsified edge set: per vertex keep the
    top-⌈deg^exponent⌉ incident edges by (nbr_jaccard desc, neighbor
    asc); an edge survives if either endpoint keeps it.  Returns
    (a, b, support, nbr_jaccard) for surviving edges."""
    if not (0.0 < exponent <= 1.0):
        raise ValueError("local_sparsify: exponent must be in (0, 1]")
    emb = edge_embeddedness(edges).localCheckpoint(eager=False)
    # one row per (endpoint, edge): rank each vertex's incident edges
    inc = emb.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("v"), F.col("b").alias("nbr"),
                    F.col("nbr_jaccard").alias("s"),
                ),
                F.struct(
                    F.col("b").alias("v"), F.col("a").alias("nbr"),
                    F.col("nbr_jaccard").alias("s"),
                ),
            )
        ).alias("e")
    ).select("e.v", "e.nbr", "e.s")
    deg = inc.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    inc = inc.join(deg, "v").withColumn(
        "k", F.ceil(F.pow(F.col("deg").cast("double"), F.lit(exponent))).cast("int")
    )
    # phase 1: bounded salted buckets — window partitions never exceed
    # ~max_fanout rows regardless of hub degree
    salted = inc.withColumn(
        "salt",
        F.pmod(
            F.xxhash64("nbr"),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("deg") / F.lit(max_fanout)).cast("long"),
            ),
        ),
    )
    w1 = Window.partitionBy("v", "salt").orderBy(F.desc("s"), F.asc("nbr"))
    pruned = (
        salted.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= F.col("k"))
        .drop("r1", "salt")
    )
    # phase 2: exact top-k over the ≤ ⌈deg/max_fanout⌉·k survivors
    w2 = Window.partitionBy("v").orderBy(F.desc("s"), F.asc("nbr"))
    kept = (
        pruned.withColumn("r", F.row_number().over(w2))
        .filter(F.col("r") <= F.col("k"))
        .select(
            F.least("v", "nbr").alias("a"),
            F.greatest("v", "nbr").alias("b"),
        )
        .distinct()
    )
    return kept.join(emb, ["a", "b"]).select(
        "a", "b", "support", "nbr_jaccard"
    )
