"""Densest-subgraph extraction — parallel greedy peeling with a
provable approximation factor (Bahmani, Kumar & Vassilvitskii,
VLDB 2012, public; the MapReduce relaxation of Charikar's greedy).

The density of a vertex set S is ``|E(S)| / |S|`` (edges of the
undirected simple graph with BOTH endpoints in S).  Sequential greedy
(peel the single minimum-degree vertex, keep the best prefix) is a
2-approximation but needs |V| rounds; the parallel relaxation peels
EVERY vertex whose degree is at most ``2(1+eps)`` times the current
average degree, which still guarantees a ``2(1+eps)`` approximation
while finishing in ``O(log_{1+eps} |V|)`` rounds — the whole point at
web scale, where |V| rounds is a non-starter and log rounds is routine.

Per round, with V_r / E_r the surviving vertex/edge counts:

    remove v  ⟺  deg_r(v) · V_r · DEN ≤ NUM · E_r

where ``NUM/DEN`` is the exact rational value of ``2·(1+eps)``
(``Fraction`` of the float, so eps = 0.5 gives the integer factor 3
and EVERY eps compares integers — no float threshold, bit-identical
in any engine).  The factors ride a 1-row crossJoin (the pagerank.py
scalar pattern), so a round is: two semi-joins to restrict edges to
survivors, one map-side-combined degree agg, one filter — no driver
action and no collect.

The round-by-round profile needs NO per-round bookkeeping: removal is
monotone, so a vertex removed in round k was alive for rounds 1..k and
``V_r = #{v : expiry(v) ≥ r}``, ``E_r = #{(a,b) : min expiry ≥ r}`` —
both recovered from the FINAL state with one tiny grouped count each
(≤ max_rounds rows collected).  The best round maximizes the IEEE
double ``E_r / V_r`` (ties → earliest round) — the same comparator the
SQL oracle runs, so the argmax is cross-engine deterministic.

Runs on SuperstepRunner: checkpoint/resume + per-round lineage and
metrics like every other iterative operator; round-k state is a pure
function of round k−1's, so the DuckDB oracle replays truncated runs
1:1 (the sssp.py unrolling contract — rounds past the empty fixpoint
are no-ops).

Beyond the reference's operator set (its 20-node AMR graphs need no
density mining); contract style follows operators/kcore.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner
from smatchpp_spark.operators.triangles import _canonical_undirected

ACTIVE = -1
_DEC = "decimal(38,0)"  # long*long*long can pass 2^63; decimal(38,0) cannot


@dataclass
class DensestResult:
    state: DataFrame  # (vertex, removed_round; -1 = never removed)
    members: DataFrame  # (vertex, best_round, n_vertices, n_edges, density)
    profile: list  # [(round, n_vertices, n_edges, density), ...] V_r > 0
    best_round: int
    best_density: float
    rounds: int
    converged: bool  # peeled to empty within the budget


def densest_subgraph(
    edges: DataFrame,
    eps: float = 0.5,
    max_rounds: int = 30,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DensestResult:
    """2(1+eps)-approximate densest subgraph of the undirected simple
    graph spanned by ``edges`` (direction/multiplicity ignored,
    self-loops dropped).  ``members`` is the surviving vertex set at
    the start of the densest observed round."""
    if eps <= 0:
        raise ValueError(f"densest_subgraph: eps must be > 0, got {eps}")
    factor = Fraction(2.0 * (1.0 + eps))  # exact value of the float
    num, den = factor.numerator, factor.denominator
    spark = edges.sparkSession
    und = _canonical_undirected(edges).persist()  # (a, b), a < b
    vertices = (
        und.select(F.col("a").alias("vertex"))
        .unionByName(und.select(F.col("b").alias("vertex")))
        .distinct()
    )
    init = vertices.select(
        "vertex", F.lit(ACTIVE).cast("int").alias("removed_round")
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        active = state.filter(F.col("removed_round") == ACTIVE).select(
            "vertex"
        )
        e_k = und.join(
            active.withColumnRenamed("vertex", "a"), "a", "left_semi"
        ).join(active.withColumnRenamed("vertex", "b"), "b", "left_semi")
        scalars = active.agg(F.count(F.lit(1)).alias("nv")).crossJoin(
            e_k.agg(F.count(F.lit(1)).alias("ne"))
        )
        deg = (
            e_k.select(F.col("a").alias("vertex"))
            .unionByName(e_k.select(F.col("b").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        removed = (
            active.join(deg, "vertex", "left")
            .crossJoin(F.broadcast(scalars))
            .filter(
                F.coalesce("deg", F.lit(0)).cast(_DEC)
                * F.col("nv").cast(_DEC)
                * F.lit(den).cast(_DEC)
                <= F.lit(num).cast(_DEC) * F.col("ne").cast(_DEC)
            )
            .select("vertex", F.lit(k).cast("int").alias("new_round"))
        )
        return state.join(removed, "vertex", "left").select(
            "vertex",
            F.coalesce("new_round", "removed_round").alias("removed_round"),
        )

    runner = SuperstepRunner(
        spark,
        op="densest",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_rounds,
        tol=0.0,
    )
    res = runner.run(
        init,
        step,
        # progress is guaranteed while any vertex survives (the min
        # degree is always ≤ the average), so empty ⟺ fixpoint
        lambda old, new: float(
            new.filter(F.col("removed_round") == ACTIVE).count()
        ),
        resume=resume,
    )
    state = res.state

    # post-hoc profile from removal rounds (ACTIVE = alive past budget)
    horizon = max_rounds + 1
    expiry = F.when(
        F.col("removed_round") == ACTIVE, F.lit(horizon)
    ).otherwise(F.col("removed_round"))
    v_hist = {
        r["e"]: r["c"]
        for r in state.select(expiry.alias("e"))
        .groupBy("e")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    rr = state.select("vertex", expiry.alias("e"))
    e_hist = {
        r["e"]: r["c"]
        for r in und.join(rr.withColumnRenamed("vertex", "a"), "a")
        .withColumnRenamed("e", "ea")
        .join(rr.withColumnRenamed("vertex", "b"), "b")
        .select(F.least("ea", "e").alias("e"))
        .groupBy("e")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    und.unpersist()
    profile = []
    v_r = sum(v_hist.values())
    e_r = sum(e_hist.values())
    for r in range(1, max_rounds + 1):
        if v_r <= 0:
            break
        profile.append((r, v_r, e_r, float(e_r) / float(v_r)))
        v_r -= v_hist.get(r, 0)
        e_r -= e_hist.get(r, 0)
    if not profile:
        raise ValueError("densest_subgraph: the edge set spans no vertices")
    best_round, best_v, best_e, best_density = max(
        profile, key=lambda t: (t[3], -t[0])
    )
    members = state.filter(
        (F.col("removed_round") == ACTIVE)
        | (F.col("removed_round") >= best_round)
    ).select(
        "vertex",
        F.lit(best_round).cast("int").alias("best_round"),
        F.lit(best_v).cast("bigint").alias("n_vertices"),
        F.lit(best_e).cast("bigint").alias("n_edges"),
        F.round(F.lit(best_density), 9).alias("density"),
    )
    return DensestResult(
        state=state,
        members=members,
        profile=profile,
        best_round=best_round,
        best_density=best_density,
        rounds=res.supersteps,
        converged=res.converged,
    )
