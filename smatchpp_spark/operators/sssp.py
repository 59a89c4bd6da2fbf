"""Weighted single/multi-source shortest paths (Bellman–Ford supersteps).

The weighted companion of bfs.py: hop distance generalizes to
``min Σ weight`` over paths.  Frontier-pruned Bellman–Ford — only
vertices whose tentative distance improved in round r relax their
out-edges in round r+1 (the standard distributed SSSP formulation;
delta-stepping's bucketing is a scheduling refinement of the same
relaxation, unnecessary here because every round is one bulk join).

Invariant used by the SQL oracle: after k rounds the state holds the
exact minimum over paths of ≤ k edges — identical to k unrolled
all-vertex relaxations — so the oracle replays rounds 1:1 whether or
not the run converged early (extra oracle rounds past the fixpoint are
no-ops).

Scale shape at 100 TB: per round one (frontier ⋈ edges) join — the
frontier shrinks geometrically on expander-ish graphs — one map-side
combined min-groupBy over candidates, and one full-outer merge keyed by
vertex.  The edge table is the only large stable input; bucket it
(sources/bucketed.py) and the per-round join is exchange-free.  State
is V rows; rounds are staged through SuperstepRunner with
checkpoint/resume/metrics like every other iterative operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import (
    SuperstepRunner,
    observe_scan_delta,
)


@dataclass
class SSSPResult:
    distances: DataFrame  # (vertex, distance) — reached vertices only
    rounds: int
    converged: bool  # no distance improved in the last round


def sssp(
    edges: DataFrame,
    sources: "list | DataFrame",
    weight_col: str = "weight",
    max_supersteps: int = 20,
    directed: bool = True,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    check_nonnegative: bool = True,
) -> SSSPResult:
    """Minimum path weight from the ``sources`` set to every reachable
    vertex.  ``edges`` must carry ``src``, ``dst`` and ``weight_col``
    (non-negative; integer weights keep cross-engine parity exact,
    doubles work but inherit float-sum ordering caveats).  Seeds absent
    from the graph are ignored; unreached vertices are absent from the
    output.  With unit weights this degenerates to ``bfs_distances``.

    Non-negativity is ENFORCED (one map-side-combined ``min(weight)``
    scan) because the changed-frontier pruning below is only sound for
    non-negative weights — a negative edge could improve an already
    settled vertex after its wave passed, silently converging to a
    wrong fixpoint.  Callers that have already validated their weights
    upstream can skip the scan with ``check_nonnegative=False``.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst", F.col(weight_col).alias("w"))
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col(weight_col).alias("w"),
            )
        )
    e = e.persist()
    if check_nonnegative:
        mn = e.agg(F.min("w").alias("m")).collect()[0]["m"]
        if mn is not None and mn < 0:
            e.unpersist()
            raise ValueError(
                f"sssp requires non-negative weights (min {weight_col} = "
                f"{mn}); the frontier pruning is unsound under negative "
                "edges. Pass check_nonnegative=False only if weights are "
                "validated upstream."
            )

    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    if isinstance(sources, DataFrame):
        seed = sources.select(
            F.col(sources.columns[0]).alias("vertex")
        ).distinct()
        seed = vertices.join(seed, "vertex", "left_semi")
    else:
        seed = vertices.filter(F.col("vertex").isin(list(sources)))
    init = seed.select(
        "vertex",
        F.lit(0).cast("long").alias("distance"),
        F.lit(True).alias("changed"),
    )

    def step(state: DataFrame, r: int) -> DataFrame:
        wave = state.filter(F.col("changed")).select("vertex", "distance")
        best = (
            wave.join(e, wave["vertex"] == e["src"])
            .select(
                F.col("dst").alias("vertex"),
                (F.col("distance") + F.col("w")).alias("cand_d"),
            )
            .groupBy("vertex")
            .agg(F.min("cand_d").alias("cand_d"))
        )
        merged = state.drop("changed").join(best, "vertex", "full_outer")
        return merged.select(
            "vertex",
            F.least("distance", "cand_d").alias("distance"),
            (
                F.col("cand_d").isNotNull()
                & (
                    F.col("distance").isNull()
                    | (F.col("cand_d") < F.col("distance"))
                )
            ).alias("changed"),
        )

    def _step_observed(state, k):
        # changed-count observed in the materialization job instead of a
        # separate per-superstep filter+count job
        return observe_scan_delta(
            step(state, k), F.sum(F.col("changed").cast("long"))
        )

    runner = SuperstepRunner(
        spark,
        op="sssp",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )
    res = runner.run(
        init,
        _step_observed,
        None,
        resume=resume,
    )
    e.unpersist()
    return SSSPResult(
        distances=res.state.select("vertex", "distance"),
        rounds=res.supersteps,
        converged=res.converged,
    )
