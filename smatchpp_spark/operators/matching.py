"""Distributed maximal matching — locally-dominant edge handshake.

The classic symmetry-breaking matching algorithm (Israeli & Itai 1986;
Hoepman 2004 / Preis 1999 for the weighted form — all public): each
round every vertex points at its best incident edge, an edge whose BOTH
endpoints point at it ("handshake", a locally dominant edge) joins the
matching, matched vertices leave the graph.  The globally best
remaining edge is always locally dominant, so every round matches at
least one edge per component; with per-round hashed tie-break
priorities the expected round count is O(log n).  With a weight column
the heaviest-first handshake is Preis's ½-approximation of maximum
weight matching.

Determinism: the per-edge sort key is the lexicographic struct
``(-weight, portable_hash(a#b#round), a, b)`` — a total order, so runs
replay exactly across engines, partitionings, and resumes; the DuckDB
oracle replays rounds verbatim.

Runs through SuperstepRunner (the shared checkpoint/resume/metrics
contract): the state is ONE DataFrame of edges where ``matched_round``
is NULL while the edge is still active and the match round once taken,
so a crashed run resumes with the matching and the frontier in
lockstep.

Scale shape: per round one union + one map-side-combined min-struct
groupBy (a 10^8-degree hub costs one row per partition), two
vertex-keyed equi-joins for the handshake test, and two anti-joins to
drop matched endpoints.  No self-joins, nothing quadratic in degree.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64
from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class MatchingResult:
    matched: DataFrame  # (a, b, weight, round)
    supersteps: int
    converged: bool  # active edge set drained ⇔ matching is maximal
    metrics: list


def maximal_matching(
    edges: DataFrame,
    weight_col: str | None = None,
    max_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    portable: bool = False,
    tol: float = 0.0,
) -> MatchingResult:
    """Maximal matching of the undirected simple graph (self-loops
    dropped, parallel edges collapsed — max weight when weighted).
    ``converged=True`` ⇔ no active edge remained ⇔ the matching is
    maximal (every unmatched edge has a matched endpoint).  Set
    ``tol=-1`` to run exactly ``max_supersteps`` rounds — the
    oracle-replayable fixed form (the partial matching after k rounds
    is deterministic).  With ``weight_col`` the handshake prefers
    heavier edges: Preis's ½-approx maximum weight matching.
    """
    spark = edges.sparkSession
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    if weight_col is None:
        e = (
            edges.select(a, b)
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .withColumn("weight", F.lit(1.0))
        )
    else:
        e = (
            edges.select(a, b, F.col(weight_col).cast("double").alias("weight"))
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.max("weight").alias("weight"))
        )
    init = e.select(
        "a", "b", "weight", F.lit(None).cast("int").alias("matched_round")
    )

    def _key(k: int):
        prio = hash64(
            F.concat_ws("#", F.col("a"), F.col("b"), F.lit(str(k))), portable
        )
        return F.struct(
            (-F.col("weight")).alias("nw"),
            prio.alias("prio"),
            F.col("a").alias("ka"),
            F.col("b").alias("kb"),
        )

    def step(state: DataFrame, k: int) -> DataFrame:
        done = state.filter(F.col("matched_round").isNotNull())
        ek = state.filter(F.col("matched_round").isNull()).select(
            "a", "b", "weight", _key(k).alias("kkey")
        )
        inc = ek.select(F.col("a").alias("v"), "kkey").unionByName(
            ek.select(F.col("b").alias("v"), "kkey")
        )
        best = inc.groupBy("v").agg(F.min("kkey").alias("bk"))
        m = (
            ek.join(
                best.select(F.col("v").alias("a"), F.col("bk").alias("best_a")),
                "a",
            )
            .join(
                best.select(F.col("v").alias("b"), F.col("bk").alias("best_b")),
                "b",
            )
            .filter(
                (F.col("kkey") == F.col("best_a"))
                & (F.col("kkey") == F.col("best_b"))
            )
            .select("a", "b", "weight", F.lit(k).cast("int").alias("matched_round"))
        )
        mv = (
            m.select(F.explode(F.array("a", "b")).alias("v")).distinct()
        )
        survivors = (
            ek.join(mv.select(F.col("v").alias("a")), "a", "left_anti")
            .join(mv.select(F.col("v").alias("b")), "b", "left_anti")
            .select(
                "a", "b", "weight",
                F.lit(None).cast("int").alias("matched_round"),
            )
        )
        return done.unionByName(m).unionByName(survivors)

    def delta(old: DataFrame, new: DataFrame) -> float:
        row = new.agg(
            F.sum(
                F.when(F.col("matched_round").isNull(), 1).otherwise(0)
            ).alias("active")
        ).collect()[0]
        return float(row["active"] or 0)

    runner = SuperstepRunner(
        spark,
        op="maximal_matching",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
    )
    res = runner.run(init, step, delta, resume=resume)
    matched = res.state.filter(F.col("matched_round").isNotNull()).select(
        "a", "b", "weight", F.col("matched_round").alias("round")
    )
    return MatchingResult(
        matched=matched,
        supersteps=res.supersteps,
        converged=res.converged,
        metrics=res.metrics,
    )
