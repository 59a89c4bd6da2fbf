"""Directed triad census (Holland–Leinhardt 16 types).

The triad census — counts of all 16 isomorphism classes of 3-vertex
directed graphs (003, 012, 102, 021D/U/C, 111D/U, 030T/C, 201,
120D/U/C, 210, 300) — is the classic structural signature of a
directed network (Holland & Leinhardt 1976; the subquadratic
decomposition is Batagelj & Mrvar, Social Networks 23, 2001 — both
public).  Naive enumeration is C(n,3); the decomposition here only
materializes CONNECTED triads with ≥2 linked dyads (wedges and
triangles), gets the single-dyad types by per-dyad arithmetic, and the
empty type 003 by subtraction — the same "touch only the sparse
structure" discipline as the dedup/linkpred operators.

Dataflow (all DataFrame ops, no Python in the hot path):

1. dyad table: canonical pair (x < y) with direction bits (fwd, bwd)
   — one map-side-combined groupBy of the distinct edge set;
2. wedges: the skeleton (dyad pair list) exploded to (center, leaf)
   and self-joined on center (leaf1 < leaf2) — output bounded by
   Σ_c C(d_c, 2); ``max_center_degree`` drops super-hub centers
   BEFORE the join (butterfly-guard discipline; dropped hubs are
   reported and make the connected counts a documented undercount);
3. closing dyad left-join splits wedges into triangles (closed, kept
   once via center < leaf1 so each triangle counts exactly once) and
   open 2-dyad triads (the center is the structural path middle, so
   each is generated exactly once);
4. the 6-bit adjacency mask of each connected triad (bits u→v, v→u,
   u→w, w→u, v→w, w→v over the sorted triple u<v<w) is assembled from
   the joined dyad direction bits and classified by a broadcast-joined
   64-row mask→type lookup (computed once at import by brute-force
   isomorphism over the 6 vertex permutations — data, not logic);
5. types 012/102: per-dyad count of third vertices adjacent to
   neither endpoint, n − 2 − (d_x − 1) − (d_y − 1) + common(x, y),
   where common = the dyad's triangle participation (exploded from the
   unique triangle set); summed separately over asym / mutual dyads;
6. 003 = C(n,3) − Σ(everything else) — scalar arithmetic.

Result: 16 rows ``(triad_type, count)``, zeros included.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Representative edge lists for the 16 triad types over vertices
# {1, 2, 3} (the standard MAN-labeling catalogue, e.g. Wasserman &
# Faust fig. 14.2 / the networkx triad module — public).
_TRIAD_REPS: dict[str, tuple[tuple[int, int], ...]] = {
    "003": (),
    "012": ((1, 2),),
    "102": ((1, 2), (2, 1)),
    "021D": ((3, 1), (3, 2)),
    "021U": ((1, 3), (2, 3)),
    "021C": ((1, 3), (3, 2)),
    "111D": ((1, 2), (2, 1), (3, 1)),
    "111U": ((1, 2), (2, 1), (1, 3)),
    "030T": ((1, 2), (3, 2), (1, 3)),
    "030C": ((1, 3), (3, 2), (2, 1)),
    "201": ((1, 2), (2, 1), (3, 1), (1, 3)),
    "120D": ((1, 2), (2, 1), (3, 1), (3, 2)),
    "120U": ((1, 2), (2, 1), (1, 3), (2, 3)),
    "120C": ((1, 2), (2, 1), (1, 3), (3, 2)),
    "210": ((1, 2), (2, 1), (1, 3), (3, 2), (2, 3)),
    "300": ((1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)),
}

# bit index for ordered pair (i, j) over the sorted triple (0, 1, 2)
_BIT = {(0, 1): 0, (1, 0): 1, (0, 2): 2, (2, 0): 3, (1, 2): 4, (2, 1): 5}


def _mask_of(edges: frozenset[tuple[int, int]]) -> int:
    m = 0
    for i, j in edges:
        m |= 1 << _BIT[(i, j)]
    return m


@lru_cache(maxsize=1)
def triad_mask_table() -> dict[int, str]:
    """mask (6-bit adjacency over a sorted triple) → triad type name,
    for all 64 masks, by brute-force isomorphism against the
    representative catalogue over the 6 vertex permutations."""
    rep_masks: dict[str, frozenset[int]] = {}
    for name, rep in _TRIAD_REPS.items():
        edges = frozenset((a - 1, b - 1) for a, b in rep)
        variants = set()
        for perm in itertools.permutations(range(3)):
            variants.add(
                _mask_of(frozenset((perm[a], perm[b]) for a, b in edges))
            )
        rep_masks[name] = frozenset(variants)
    out: dict[int, str] = {}
    for mask in range(64):
        matches = [n for n, ms in rep_masks.items() if mask in ms]
        assert len(matches) == 1, (mask, matches)
        out[mask] = matches[0]
    return out


TRIAD_TYPES = tuple(_TRIAD_REPS)


def triad_census(
    edges: DataFrame,
    max_center_degree: int | None = None,
) -> DataFrame:
    """16-row Holland–Leinhardt census ``(triad_type, count)`` of the
    simple directed graph (duplicate edges collapse, self-loops
    dropped).  With ``max_center_degree`` set, wedge centers above the
    cap are dropped before the self-join (connected-triad counts become
    a documented undercount, and 012/102/003 — computed by arithmetic,
    not enumeration — stay exact)."""
    spark = edges.sparkSession

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    dyads = (
        e.select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("f"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("b"),
        )
        .groupBy("x", "y")
        .agg(F.max("f").alias("fwd"), F.max("b").alias("bwd"))
        .localCheckpoint(eager=True)
    )

    # skeleton degrees + scalar totals
    ends = dyads.select(F.col("x").alias("v")).unionByName(
        dyads.select(F.col("y").alias("v"))
    )
    deg = ends.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    n_vertices = deg.count()

    # wedges pivoted at the center (leaf1 < leaf2)
    half = dyads.select(
        F.col("x").alias("c"), F.col("y").alias("u")
    ).unionByName(dyads.select(F.col("y").alias("c"), F.col("x").alias("u")))
    dropped_centers = 0
    if max_center_degree is not None:
        keep = deg.filter(F.col("d") <= max_center_degree)
        dropped_centers = n_vertices - keep.count()
        half = half.join(
            keep.select(F.col("v").alias("c")), "c", "left_semi"
        )
    w1 = half
    w2 = half.select(F.col("c"), F.col("u").alias("u2"))
    wedges = w1.join(w2, "c").filter(F.col("u") < F.col("u2"))

    closing = dyads.select(
        F.col("x").alias("u"),
        F.col("y").alias("u2"),
        F.col("fwd").alias("fwd_o"),
        F.col("bwd").alias("bwd_o"),
    )
    wedged = wedges.join(closing, ["u", "u2"], "left").localCheckpoint(
        eager=True
    )

    # --- connected triads: assemble the 6-bit mask over sorted triple
    def _bits(
        lo: Column, hi: Column, fwd: Column, bwd: Column,
        s0: Column, s1: Column, s2: Column,
    ) -> Column:
        """contribution of dyad (lo<hi, fwd: lo→hi, bwd: hi→lo) to the
        mask, depending on which sorted-pair slot (lo, hi) occupies."""
        return (
            F.when(
                (lo == s0) & (hi == s1), fwd * 1 + bwd * 2
            )
            .when((lo == s0) & (hi == s2), fwd * 4 + bwd * 8)
            .otherwise(fwd * 16 + bwd * 32)
        )

    # dyad (c,u): lo=min, hi=max with fwd meaning lo→hi; the half table
    # lost direction, so re-join dyads for (c,u) and (c,u2)
    j1 = wedged.join(
        dyads.select(
            F.col("x").alias("a1"), F.col("y").alias("b1"),
            F.col("fwd").alias("fwd_1"), F.col("bwd").alias("bwd_1"),
        ),
        (F.least("c", "u") == F.col("a1"))
        & (F.greatest("c", "u") == F.col("b1")),
    )
    j2 = j1.join(
        dyads.select(
            F.col("x").alias("a2"), F.col("y").alias("b2"),
            F.col("fwd").alias("fwd_2"), F.col("bwd").alias("bwd_2"),
        ),
        (F.least("c", "u2") == F.col("a2"))
        & (F.greatest("c", "u2") == F.col("b2")),
    )

    s = F.array_sort(F.array("c", "u", "u2"))
    s0, s1, s2 = s[0], s[1], s[2]
    mask = (
        _bits(F.col("a1"), F.col("b1"), F.col("fwd_1"), F.col("bwd_1"), s0, s1, s2)
        + _bits(F.col("a2"), F.col("b2"), F.col("fwd_2"), F.col("bwd_2"), s0, s1, s2)
        + F.when(
            F.col("fwd_o").isNotNull(),
            # closing dyad (u < u2) is always the (s?, s?) pair NOT
            # involving c; _bits handles slot selection uniformly
            _bits(
                F.col("u"), F.col("u2"),
                F.col("fwd_o"), F.col("bwd_o"), s0, s1, s2,
            ),
        ).otherwise(F.lit(0))
    )

    connected = j2.select(
        mask.alias("mask"),
        F.col("fwd_o").isNotNull().alias("closed"),
        F.col("c"), F.col("u"), F.col("u2"),
    )
    # triangles appear once per center: keep center == min leaf-order
    connected = connected.filter(
        (~F.col("closed")) | (F.col("c") < F.col("u"))
    )

    lookup = spark.createDataFrame(
        sorted(triad_mask_table().items()), "mask int, triad_type string"
    )
    conn_counts = (
        connected.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("count"))
        .join(F.broadcast(lookup), "mask")
        .groupBy("triad_type")
        .agg(F.sum("count").alias("count"))
    )

    # --- per-dyad triangle participation → 012 / 102 by arithmetic
    tri_dyads = (
        connected.filter("closed")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("c", "u").alias("x"),
                        F.greatest("c", "u").alias("y"),
                    ),
                    F.struct(
                        F.least("c", "u2").alias("x"),
                        F.greatest("c", "u2").alias("y"),
                    ),
                    F.struct(F.col("u").alias("x"), F.col("u2").alias("y")),
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("ntri"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))
    per_dyad = (
        dyads.join(tri_dyads, ["x", "y"], "left")
        .join(dx, "x")
        .join(dy, "y")
        .select(
            ((F.col("fwd") + F.col("bwd")) == 2).alias("mutual"),
            (
                F.lit(n_vertices)
                - F.lit(2)
                - (F.col("dx") - 1)
                - (F.col("dy") - 1)
                + F.coalesce(F.col("ntri"), F.lit(0))
            ).cast("long").alias("lone"),
        )
    )
    lone_counts = per_dyad.groupBy("mutual").agg(
        F.sum("lone").alias("count")
    )
    lone_df = lone_counts.select(
        F.when(F.col("mutual"), F.lit("102"))
        .otherwise(F.lit("012"))
        .alias("triad_type"),
        "count",
    )

    # --- assemble all 16 rows; 003 by subtraction
    types_df = spark.createDataFrame(
        [(t,) for t in TRIAD_TYPES], "triad_type string"
    )
    partial = conn_counts.unionByName(lone_df)
    total_named = (
        partial.agg(F.coalesce(F.sum("count"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    n = n_vertices
    empty = n * (n - 1) * (n - 2) // 6 - int(total_named)
    out = (
        types_df.join(partial, "triad_type", "left")
        .select(
            "triad_type",
            F.when(
                F.col("triad_type") == "003", F.lit(empty).cast("long")
            )
            .otherwise(F.coalesce(F.col("count"), F.lit(0)).cast("long"))
            .alias("count"),
        )
    )
    if dropped_centers:
        out = out.withColumn(
            "dropped_centers", F.lit(int(dropped_centers))
        )
    return out
