"""Topological layering and cycle detection over the directed edge
table — distributed Kahn peeling.

Kahn's algorithm (Kahn 1962, public) peels in-degree-0 vertices in
rounds; the round a vertex is peeled in is its LAYER — the length of
the longest path reaching it from any source, i.e. the earliest
parallel-schedule slot that respects every dependency edge (the
standard interpretation for build graphs, dataflow DAGs, crawl
frontiers).  A vertex still unpeeled when peeling reaches a fixed point
sits on or downstream of a directed cycle.

Superstep shape (oracle-replayable: round k's peel set is a pure
function of round k-1's state, so a fixed unroll matches row for row):
  * ``blocked`` = distinct dst of edges whose src is still unpeeled —
    ONE semi-join of the edge table against the active vertex set plus
    a map-side-combinable distinct;
  * the round's peel set = active vertices NOT in ``blocked``
    (left-anti join);
  * state merge keyed by vertex.
Per round that is two shuffles on the vertex key; the edge table is
filtered by a semi-join against the shrinking active set, so work
decays as layers peel — the same active-set discipline as mis.py /
sssp.py.  Depth-D DAGs finish in D rounds; web-scale dependency
graphs are shallow (D ≪ log-ish), and for deep chains ``max_supersteps``
bounds the budget with ``converged=False`` reported honestly.

Cycle semantics: when a round peels NOTHING but active vertices remain
(delta stalls), every remaining vertex is marked ``layer = -1``
(``on_or_after_cycle``) and the runner stops on its own
no-progress tolerance — detection costs no extra pass.

Beyond the reference's operator set (its pipeline has no DAG
scheduling); contract style follows operators/mis.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner

UNASSIGNED = -1


@dataclass
class TopoLayersResult:
    layers: DataFrame  # (vertex, layer int; -1 = on/after a cycle)
    rounds: int
    acyclic: bool  # every vertex got a layer
    converged: bool  # peeling reached a fixed point within the budget


def topological_layers(
    edges: DataFrame,
    max_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> TopoLayersResult:
    """Layer the directed graph spanned by ``edges(src, dst)``.
    Self-loops make their vertex cyclic by definition and are kept
    (the vertex blocks itself and is never peeled).  Parallel edges
    are collapsed — layering is a reachability property.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct().persist()
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    init = vertices.select(
        "vertex", F.lit(UNASSIGNED).cast("int").alias("layer")
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        active = state.filter(F.col("layer") == UNASSIGNED).select("vertex")
        blocked = (
            e.join(
                active.withColumnRenamed("vertex", "src"), "src", "left_semi"
            )
            .select(F.col("dst").alias("vertex"))
            .distinct()
        )
        peeled = active.join(blocked, "vertex", "left_anti").withColumn(
            "new_layer", F.lit(k - 1).cast("int")
        )
        return state.join(peeled, "vertex", "left").select(
            "vertex",
            F.coalesce("new_layer", "layer").alias("layer"),
        )

    runner = SuperstepRunner(
        spark,
        op="topo_layers",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )

    # stall-aware wrapper: Kahn's fixed point is "peeled nothing this
    # round" — strictly earlier than "zero active" on cyclic graphs.
    prev_active = {"n": None}

    def delta_stall(old: DataFrame, new: DataFrame) -> float:
        n = new.filter(F.col("layer") == UNASSIGNED).count()
        stalled = prev_active["n"] is not None and n == prev_active["n"]
        prev_active["n"] = n
        return 0.0 if (n == 0 or stalled) else float(n)

    res = runner.run(init, step, delta_stall, resume=resume)
    e.unpersist()
    remaining = res.state.filter(F.col("layer") == UNASSIGNED).count()
    return TopoLayersResult(
        layers=res.state.select("vertex", "layer"),
        rounds=res.supersteps,
        acyclic=remaining == 0,
        converged=res.converged,
    )
