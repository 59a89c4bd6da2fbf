"""Minimum spanning forest — distributed Borůvka.

The textbook bulk-parallel MSF algorithm (Borůvka 1926 / the standard
MapReduce-MST formulation, public): every round each component picks
its minimum-weight edge leaving the component, the picked edges join
the forest, and the components they connect merge.  The component
count at least halves per round → O(log V) rounds.

Determinism: edges are canonicalized to ``(a < b, min weight)`` and the
per-component pick minimizes the lexicographic ``(weight, a, b)``
struct — a total order, so ties never create cycles and runs replay
exactly across engines and partitionings.

Round invariant (oracle-replay contract): with the component-merge
step run to its fixpoint, the (vertex, component) table and the
accumulated forest after k Borůvka rounds are identical in any engine
replaying the same pick/merge schedule — rounds past convergence
pick nothing and are no-ops.

Scale shape at 100 TB: per round two vertex-keyed joins to label edge
endpoints with components, one map-side-combined min-struct groupBy
for the picks, and a hash-min CC on the PICKED-EDGE component graph
only (≤ one edge per component — geometrically shrinking).  The full
edge table is re-labeled each round but never self-joined; everything
keys on vertex/component ids.  Forest and labels are localCheckpointed
per round to keep lineage flat.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.components import connected_components


@dataclass
class MSFResult:
    forest: DataFrame  # (a, b, weight) — the chosen edges
    n_edges: int
    total_weight: float
    rounds: int
    converged: bool  # no inter-component edge remained


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 20,
    cc_supersteps: int = 50,
) -> MSFResult:
    """Borůvka MSF of the undirected graph spanned by ``edges`` —
    self-loops dropped, parallel edges collapsed to their minimum
    weight.  Raises if a round's component merge does not reach its
    CC fixpoint within ``cc_supersteps`` (a truncated merge would
    silently duplicate forest edges)."""
    a = F.least("src", "dst")
    b = F.greatest("src", "dst")
    e = (
        edges.select(a.alias("a"), b.alias("b"), F.col(weight_col).alias("w"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    comp = (
        e.select(F.col("a").alias("vertex"))
        .unionByName(e.select(F.col("b").alias("vertex")))
        .distinct()
        .select("vertex", F.col("vertex").alias("component"))
        .localCheckpoint(eager=True)
    )

    forest: DataFrame | None = None
    rounds = 0
    converged = False
    for r in range(1, max_rounds + 1):
        e2 = (
            e.join(
                comp.select(
                    F.col("vertex").alias("a"), F.col("component").alias("ca")
                ),
                "a",
            )
            .join(
                comp.select(
                    F.col("vertex").alias("b"), F.col("component").alias("cb")
                ),
                "b",
            )
            .where(F.col("ca") != F.col("cb"))
        )
        edge = F.struct("w", "a", "b", "ca", "cb").alias("edge")
        cand = e2.select(F.col("ca").alias("comp"), edge).unionByName(
            e2.select(F.col("cb").alias("comp"), edge)
        )
        picked = (
            cand.groupBy("comp")
            .agg(F.min("edge").alias("edge"))
            .select("edge.w", "edge.a", "edge.b", "edge.ca", "edge.cb")
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        if picked.limit(1).count() == 0:
            converged = True
            break
        rounds = r
        add = picked.select("a", "b", F.col("w").alias("weight"))
        forest = add if forest is None else forest.unionByName(add)
        forest = forest.localCheckpoint(eager=True)
        cc = connected_components(
            picked.select(F.col("ca").alias("src"), F.col("cb").alias("dst")),
            max_supersteps=cc_supersteps,
        )
        if not cc.converged:
            raise RuntimeError(
                "minimum_spanning_forest: component merge did not reach "
                f"its fixpoint within cc_supersteps={cc_supersteps}"
            )
        remap = cc.components.select(
            F.col("vertex").alias("component"), F.col("component").alias("newc")
        )
        comp = (
            comp.join(remap, "component", "left")
            .select(
                "vertex",
                F.coalesce("newc", "component").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    spark = edges.sparkSession
    if forest is None:
        forest = spark.createDataFrame(
            [], "a string, b string, weight long"
        )
        return MSFResult(forest, 0, 0.0, rounds, converged)
    row = forest.agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("tw")
    ).collect()[0]
    return MSFResult(
        forest=forest,
        n_edges=int(row["n"]),
        total_weight=float(row["tw"] or 0.0),
        rounds=rounds,
        converged=converged,
    )
