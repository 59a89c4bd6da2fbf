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

Scale shape at 100 TB: each round reuses the triangle corner pattern
(triangles.py): one (lo, hi) wedge self-join on the orientation key +
one closing-edge equi-join, then an explode of the three triangle edges
into a map-side-combined per-edge count.  The edge set only shrinks, so
round cost decays; everything keys on vertex/edge ids, no all-pairs.
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


def _support(e: DataFrame) -> DataFrame:
    """Per-edge triangle counts within canonical edge set ``(a < b)``.
    Edges in no triangle get no row (support 0)."""
    w1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        w1.join(w2, "x")
        .filter(F.col("y") < F.col("z"))
        .join(
            e.select(F.col("a").alias("y"), F.col("b").alias("z")),
            ["y", "z"],
        )
    )
    pairs = F.array(
        F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
        F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
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
