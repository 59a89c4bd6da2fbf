"""k-truss decomposition (fixed k) — iterative support peeling.

The cohesive-subgraph standard (Cohen 2008, public): the k-truss is the
maximal subgraph where every edge closes at least ``k − 2`` triangles
WITHIN the subgraph.  Computed by peeling: count per-edge triangle
support, drop edges below ``k − 2``, repeat until stable — dropping an
edge can only lower its neighbors' support, so the fixpoint is the
truss.

Determinism: pure set-valued fixpoint — no tie-breaking needed; the
surviving edge set after any fixed number of rounds is identical in
every engine (the sssp/mis 1:1 unrolling contract; rounds past the
fixpoint are no-ops).

Scale shape at 100 TB: each round re-orients the SURVIVING edge set by
(degree, id) — the triangles.py hub-skew killer — then runs one wedge
self-join pivoting on the low-degree endpoint + one closing-edge
equi-join, then an explode of the three triangle edges into a
map-side-combined per-edge count.  Wedge candidates are bounded by
sum(d_lo**2), d_lo <= sqrt(2m), independent of vertex-id assignment.
The edge set only shrinks, so both the re-orientation and the wedge
work decay per round; everything keys on vertex/edge ids, no
all-pairs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class KTrussResult:
    edges: DataFrame  # (a, b, support) — the k-truss, support on it
    rounds: int
    converged: bool


def _oriented(e: DataFrame) -> DataFrame:
    """Orient the canonical edge set (a < b) from low (degree, id) to
    high (degree, id), degrees measured ON ``e`` — recomputed per peel
    round because degrees shrink as edges peel.  Pivoting wedges on the
    low-degree endpoint bounds candidates by sum(d_lo**2) with
    d_lo <= sqrt(2m) (same hub-skew killer as triangles.py
    ``oriented_edges``); a hub that happens to have a small vertex id
    can no longer generate O(d**2) wedge rows."""
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = e.join(
        deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def _support(e: DataFrame) -> DataFrame:
    """Per-edge triangle counts within canonical edge set ``(a < b)``.

    Degree-oriented: wedges pivot on the low-(degree, id) endpoint of
    each surviving edge, so each triangle is generated exactly once at
    its unique two-out-edges corner of the orientation DAG.  The
    oriented set is checkpointed once per round because it feeds both
    sides of the wedge self-join (a raw self-join would plan the
    degree agg + orientation joins twice).  Edges in no triangle get no
    row (support 0)."""
    oriented = _oriented(e).localCheckpoint(eager=True)
    w1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("y"))
    w2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("z"))
    # each unordered out-wedge at p exactly once via strict id order
    wedges = w1.join(w2, "p").filter(F.col("y") < F.col("z"))
    # y < z by id, so the closing edge is already in canonical form
    tri = wedges.join(
        e.select(F.col("a").alias("y"), F.col("b").alias("z")), ["y", "z"]
    )
    # corners (p, y, z): p is the low-DEGREE endpoint, not the low id,
    # so the p-edges need re-canonicalising; (y, z) already is.
    pairs = F.array(
        F.struct(F.least("p", "y").alias("a"), F.greatest("p", "y").alias("b")),
        F.struct(F.least("p", "z").alias("a"), F.greatest("p", "z").alias("b")),
        F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
    )
    return (
        tri.select(F.explode(pairs).alias("e"))
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def ktruss(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 30,
) -> KTrussResult:
    """The ``k``-truss of the undirected simple graph spanned by
    ``edges`` (k ≥ 3; direction/multiplicity ignored, self-loops
    dropped).  Output support is computed ON the final truss."""
    if k < 3:
        raise ValueError("ktruss requires k >= 3")
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = False
    for r in range(1, max_rounds + 1):
        n_before = e.count()
        if n_before == 0:
            converged = True
            break
        sup = _support(e)
        kept = (
            e.join(sup, ["a", "b"])
            .filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_after = kept.count()
        if n_after == n_before:
            converged = True
            e = kept
            break
        rounds = r
        e = kept
    final = e.join(_support(e), ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).alias("support")
    )
    return KTrussResult(edges=final, rounds=rounds, converged=converged)
