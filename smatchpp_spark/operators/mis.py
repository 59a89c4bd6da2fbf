"""Maximal independent set — Luby's algorithm with deterministic
per-round hash priorities.

The classic symmetry-breaking primitive of distributed graph computing
(Luby 1986, public): per round every still-undecided vertex draws a
priority; a vertex enters the MIS when its priority is strictly
smaller than every still-undecided neighbor's, and the new members'
undecided neighbors are removed.  Expected O(log n) rounds.

Determinism: the priority is ``portable_hash64(vertex:mis:seed:round)``
— a fixed function of (vertex, seed, round) — so runs are reproducible
across partitionings and engines, and the SQL oracle replays round for
round.  Ties (astronomically unlikely 60-bit collisions) leave both
vertices undecided; the next round's re-hash breaks them.

Round invariant (the oracle-replay contract): after k rounds both
engines hold the identical (vertex, status) table, converged or not —
the same 1:1 unrolling argument as sssp.py.

Scale shape at 100 TB: per round one (active ⋈ edges ⋈ active) join for
neighbor-minimum priorities, one winners-neighbor semi-join for
removals, and one status merge keyed by vertex — the active set shrinks
geometrically (a constant expected fraction of edges is removed every
round, Luby's analysis), so round cost decays; the full edge table is
only scanned while its endpoints are active.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import portable_hash64
from smatchpp_spark.operators.supersteps import SuperstepRunner

UNDECIDED, IN_MIS, REMOVED = 0, 1, 2


@dataclass
class MISResult:
    members: DataFrame  # (vertex, in_mis boolean, decided boolean)
    rounds: int
    converged: bool  # every vertex decided


def maximal_independent_set(
    edges: DataFrame,
    max_supersteps: int = 30,
    seed: int = 7,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> MISResult:
    """Luby MIS over the undirected simple graph spanned by ``edges``
    (direction and multiplicity are ignored — independence is a
    symmetric property).  Self-loops are dropped (a self-looped vertex
    can never satisfy strict inequality against itself)."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    ue = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    vertices = ue.select(F.col("src").alias("vertex")).distinct()
    init = vertices.select(
        "vertex", F.lit(UNDECIDED).cast("int").alias("status")
    )

    def prio(col, r: int):
        return portable_hash64(
            F.concat(col.cast("string"), F.lit(f":mis:{seed}:{r}"))
        )

    def step(state: DataFrame, r: int) -> DataFrame:
        act = state.filter(F.col("status") == UNDECIDED).select(
            "vertex", prio(F.col("vertex"), r).alias("prio")
        )
        # min priority among ACTIVE neighbors (both endpoints active)
        mn = (
            ue.join(
                act.select(
                    F.col("vertex").alias("src"), F.col("prio").alias("psrc")
                ),
                "src",
            )
            .join(act.select(F.col("vertex").alias("dst")), "dst")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("psrc").alias("mn"))
        )
        winners = (
            act.join(mn, "vertex", "left")
            .where(F.col("mn").isNull() | (F.col("prio") < F.col("mn")))
            .select("vertex")
        )
        removed = (
            ue.join(winners.withColumnRenamed("vertex", "src"), "src")
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(act.select("vertex"), "vertex", "left_semi")
        )
        return (
            state.join(
                winners.withColumn("w", F.lit(True)), "vertex", "left"
            )
            .join(removed.withColumn("rm", F.lit(True)), "vertex", "left")
            .select(
                "vertex",
                F.when(F.col("status") != UNDECIDED, F.col("status"))
                .when(F.col("w"), F.lit(IN_MIS))
                .when(F.col("rm"), F.lit(REMOVED))
                .otherwise(F.lit(UNDECIDED))
                .cast("int")
                .alias("status"),
            )
        )

    runner = SuperstepRunner(
        spark,
        op="mis",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )
    res = runner.run(
        init,
        step,
        lambda old, new: float(
            new.filter(F.col("status") == UNDECIDED).count()
        ),
        resume=resume,
    )
    ue.unpersist()
    return MISResult(
        members=res.state.select(
            "vertex",
            (F.col("status") == IN_MIS).alias("in_mis"),
            (F.col("status") != UNDECIDED).alias("decided"),
        ),
        rounds=res.supersteps,
        converged=res.converged,
    )
