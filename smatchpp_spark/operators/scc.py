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
    from smatchpp_spark.operators.supersteps import free_local_checkpoint

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
        free_local_checkpoint(state)
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
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> SCCResult:
    """(vertex, scc) with scc = the minimum vertex id in the SCC —
    vertices on no cycle are singleton components labelled by
    themselves.  Self-loops ignored; multi-edges collapsed.

    Outer peel rounds run through SuperstepRunner: the superstep state
    is the full ``(vertex, scc-nullable)`` table (unpeeled vertices
    carry null), so a crashed run resumes at the committed round with
    metrics/lineage like every other iterative operator.  The round's
    surviving edge set is re-derived from the null slice by two
    semi-joins — one-table state keeps resume trivial, at the cost of
    one edge-filter job per round (the inner fixpoints then iterate on
    the filtered localCheckpoint, never re-filtering per step)."""
    from smatchpp_spark.operators.supersteps import SuperstepRunner

    spark = edges.sparkSession
    e0 = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e0.select(F.col("src").alias("vertex"))
        .unionByName(e0.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    init = verts.select(
        "vertex",
        F.lit(None).cast(verts.schema["vertex"].dataType).alias("scc"),
    )

    # blocks checkpointed during round k (filtered edges + both fixpoint
    # results) are dead once the runner materializes round k's state —
    # free them at the next round's entry instead of waiting for driver
    # GC, or block-manager storage accumulates over long peel sequences
    # (free_local_checkpoint, not unpersist(): the latter is a no-op
    # for localCheckpoint blocks)
    from smatchpp_spark.operators.supersteps import free_local_checkpoint

    round_ckpts: list[DataFrame] = []

    def _free_round_ckpts() -> None:
        while round_ckpts:
            free_local_checkpoint(round_ckpts.pop())

    def step(state: DataFrame, k: int) -> DataFrame:
        _free_round_ckpts()
        rem = state.filter(F.col("scc").isNull()).select("vertex")
        keep = rem.select(F.col("vertex").alias("kv"))
        e = (
            e0.join(keep.withColumnRenamed("kv", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("kv", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        f = _min_label_fixpoint(rem, e, max_label_steps)
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        b = _min_label_fixpoint(rem, rev, max_label_steps)
        round_ckpts.extend((e, f, b))
        peeled = (
            f.join(b.withColumnRenamed("lbl", "blbl"), "vertex")
            .filter(F.col("lbl") == F.col("blbl"))
            .select("vertex", F.col("lbl").alias("new_scc"))
        )
        return state.join(peeled, "vertex", "left").select(
            "vertex", F.coalesce("scc", "new_scc").alias("scc")
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        # 0 exactly when every vertex is labelled — the fixpoint
        return float(new.filter(F.col("scc").isNull()).count())

    runner = SuperstepRunner(
        spark,
        op="scc",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_rounds,
        tol=0.0,
    )
    res = runner.run(init, step, delta, resume=resume)
    _free_round_ckpts()
    free_local_checkpoint(e0)
    return SCCResult(
        components=res.state, rounds=res.supersteps, converged=res.converged
    )
