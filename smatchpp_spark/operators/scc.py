"""Strongly connected components over the directed edge table.

FW-BW-MIN peeling (the standard distributed SCC family — Orzan's
coloring / forward-backward min-label, public algorithms): per outer
round compute, by hash-min fixpoint propagation,

  * ``f(v)`` — the minimum vertex id among v's ancestors ∪ {v}
    (min label flowing FORWARD along edges), and
  * ``b(v)`` — the minimum id among v's descendants ∪ {v}
    (min label flowing BACKWARD).

A vertex with ``f(v) == b(v) == c`` is mutually reachable with ``c``,
so it belongs to SCC(c); every basin-local minimum peels its entire SCC
per round (the global minimum always does, so progress is guaranteed).
Peeled vertices and their edges are removed and the loop repeats.

Scale shape: each inner fixpoint step is one directed join + one
map-side-combined min aggregation (the CC dataflow, components.py);
state is localCheckpoint-staged so lineage stays flat.  Outer rounds =
number of "basin generations" — small on real web/code graphs, but a
directed path degenerates to O(V) rounds (the known weakness of this
family), so ``max_rounds`` caps work and ``converged=False`` reports
partial labels (unpeeled vertices carry null scc).

Tested against a pure-python Tarjan oracle (tests/test_graphstats.py);
the contract row is rows-only (mutual-reachability closure is not
tractably ANSI-SQL-expressible at oracle scale).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SCCResult:
    components: DataFrame  # (vertex, scc) — scc null if round cap hit
    rounds: int
    converged: bool


def _min_label_fixpoint(
    vertices: DataFrame, edges: DataFrame, max_steps: int = 50
) -> DataFrame:
    """Min-label propagation along DIRECTED edges to fixpoint:
    lbl(v) = min(lbl(v), lbl(u) for u→v).  Returns (vertex, lbl).

    MUST reach the true fixpoint: peeling with truncated labels can
    SPLIT an SCC (one member sees the basin minimum, another doesn't),
    so hitting ``max_steps`` without convergence raises instead of
    returning unsound labels.  Convergence takes ≤ graph diameter
    steps; raise the cap for pathological long-path graphs."""
    state = vertices.select("vertex", F.col("vertex").alias("lbl"))
    state = state.localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_steps):
        incoming = (
            state.join(edges, state["vertex"] == edges["src"])
            .select(F.col("dst").alias("vertex"), "lbl")
            .groupBy("vertex")
            .agg(F.min("lbl").alias("in_lbl"))
        )
        new = (
            state.join(incoming, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    "lbl", F.coalesce("in_lbl", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            state.select("vertex", F.col("lbl").alias("old"))
            .join(new, "vertex")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        state.unpersist()
        state = new
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"scc: min-label propagation did not converge in {max_steps} "
            "steps (graph diameter exceeds the cap); raise max_label_steps"
        )
    return state


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 20,
    max_label_steps: int = 50,
) -> SCCResult:
    """(vertex, scc) with scc = the minimum vertex id in the SCC —
    vertices on no cycle are singleton components labelled by
    themselves.  Self-loops ignored; multi-edges collapsed."""
    spark = edges.sparkSession
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done: DataFrame | None = None
    rounds = 0
    converged = False
    for rounds in range(1, max_rounds + 1):
        f = _min_label_fixpoint(verts, e, max_label_steps)
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        b = _min_label_fixpoint(verts, rev, max_label_steps)
        peeled = (
            f.join(b.withColumnRenamed("lbl", "blbl"), "vertex")
            .filter(F.col("lbl") == F.col("blbl"))
            .select("vertex", F.col("lbl").alias("scc"))
            .localCheckpoint(eager=True)
        )
        done = peeled if done is None else done.unionByName(peeled)
        remaining = verts.join(peeled, "vertex", "left_anti").localCheckpoint(
            eager=True
        )
        if remaining.isEmpty():
            converged = True
            break
        keep = remaining.select(F.col("vertex").alias("k"))
        e = (
            e.join(keep.withColumnRenamed("k", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("k", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        verts = remaining
    if not converged and done is not None:
        done = done.unionByName(
            verts.join(done, "vertex", "left_anti").select(
                "vertex", F.lit(None).cast(done.schema["scc"].dataType).alias("scc")
            )
        )
    if done is None:
        done = spark.createDataFrame([], "vertex string, scc string")
    return SCCResult(components=done, rounds=rounds, converged=converged)
