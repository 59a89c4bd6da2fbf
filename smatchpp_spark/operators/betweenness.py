"""Approximate betweenness centrality — Brandes with sampled sources.

Beyond the reference's operator set (the §2.14 link-graph mandate class);
the Brandes forward pass reuses the multi-source BFS frontier discipline
of bfs.py:34 and the superstep contract shared by every iterative
operator (checkpoint/resume/metrics, supersteps.py).

Algorithm (Brandes 2001, "A Faster Algorithm for Betweenness
Centrality"; the sampled-source estimator is Brandes–Pich 2007):

1. **Forward** (per sampled source ``s``, all sources simultaneously,
   keyed by ``s``): level-synchronous BFS computing hop distance and
   the number of shortest paths ``sigma`` — each round is one
   frontier⋈edges join + a (s, dst) sigma-sum + an anti-join against
   reached state, exactly the bfs.py shape with one extra aggregated
   column.
2. **DAG**: one join of the forward state with the edge table keeps
   only shortest-path edges (``dist(w) = dist(v) + 1``) — built once,
   persisted, reused by every backward round.
3. **Backward** (dependency accumulation): levels are processed from
   the deepest wave down; each round joins the DAG slice at that level
   with the successors' finished deltas:
   ``delta(v) = Σ_w (sigma_v / sigma_w) · (1 + delta(w))``.
4. ``bc(v) = Σ_s delta_s(v)`` over the sampled sources, v ≠ s,
   halved for undirected graphs.  Callers that want the
   Brandes–Pich unbiased estimate rescale by ``|V| / |sources|``.

Truncation: ``max_depth`` bounds BOTH passes — the result is
k-betweenness (dependencies over shortest paths of ≤ ``max_depth``
hops; Borgatti's bounded-distance betweenness, also published), which
is what makes the operator both unrollable for the SQL oracle and
shuffle-bounded at 100 TB (the frontier never explodes past k hops).

Float determinism: every delta aggregation is an ORDERED LEFT FOLD over
the sorted term array (``array_sort ∘ collect_list`` then
``F.aggregate``) instead of a partition-order ``F.sum`` — addition of
doubles is not associative, and the driver's DuckDB oracle replays the
identical fold (``list_reduce(list_sort(...))``), so scores are
bit-identical across engines, not merely close.  All terms are
strictly positive (sigma ≥ 1, delta ≥ 0), so the fold's 0.0 seed is
exact.

Scale shape: state is ``|sources| × reached`` rows keyed (s, vertex) —
sources are batched (the K in the estimator IS the batch knob), every
join is an equi-join on (s, vertex) or the edge key, the DAG is built
once and reused L times, and no driver-side collection exceeds the
1-row max-level scalar.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import (
    SuperstepRunner,
    free_local_checkpoint,
    observed_row_count_delta,
)


@dataclass
class BetweennessResult:
    scores: DataFrame  # (vertex, betweenness double) — positive rows only
    rounds: int  # forward + backward supersteps actually run
    converged: bool  # forward frontier exhausted before max_depth


def ordered_fold_sum(col: Column | str) -> Column:
    """Deterministic double sum: left fold over the ascending-sorted
    term array.  Bit-identical to DuckDB's
    ``list_reduce(list_sort(list(x)), (a, b) -> a + b)`` for positive
    terms (the 0.0 seed is exact there)."""
    return F.aggregate(
        F.array_sort(F.collect_list(col)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def betweenness_approx(
    edges: DataFrame,
    sources: "list | DataFrame",
    max_depth: int = 6,
    directed: bool = False,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> BetweennessResult:
    """Sampled-source (truncated) Brandes betweenness over the edge
    table.  ``sources`` is a list of vertex ids or a DataFrame whose
    first column holds them; seeds absent from the graph are ignored
    (bfs.py contract).  Output keeps vertices with positive score only
    — zeros are exact on both engines, so the filter is deterministic.
    """
    spark = edges.sparkSession
    step_edges = edges.select("src", "dst").distinct()
    if not directed:
        step_edges = (
            edges.select("src", "dst")
            .unionByName(
                edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .distinct()
        )
    step_edges = step_edges.persist()

    vertices = (
        step_edges.select(F.col("src").alias("vertex"))
        .unionByName(step_edges.select(F.col("dst").alias("vertex")))
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
        F.col("vertex").alias("s"),
        "vertex",
        F.lit(0).cast("long").alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    )

    # -- forward: multi-source BFS with path counting ---------------------
    def fstep(state: DataFrame, r: int) -> DataFrame:
        wave = state.filter(F.col("dist") == r - 1).select(
            "s", F.col("vertex").alias("src"), "sigma"
        )
        nxt = (
            wave.join(step_edges, "src")
            .groupBy("s", F.col("dst").alias("vertex"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(state.select("s", "vertex"), ["s", "vertex"], "left_anti")
            .select(
                "s", "vertex", F.lit(r).cast("long").alias("dist"), "sigma"
            )
        )
        return fattach(state, state.unionByName(nxt))

    # frontier rows only grow; the new state's count is observed inside
    # the materialization job (zero extra jobs per depth)
    fattach = observed_row_count_delta(sign=-1)

    fwd = SuperstepRunner(
        spark,
        op="betweenness_fwd",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_depth,
        tol=0.0,
    )
    fres = fwd.run(init, fstep, None, resume=resume)
    fw = fres.state

    # -- shortest-path DAG: built once, reused every backward round -------
    dag = (
        fw.select(
            "s",
            F.col("vertex").alias("v"),
            F.col("dist").alias("dv"),
            F.col("sigma").alias("sv"),
        )
        .join(step_edges, F.col("v") == F.col("src"))
        .join(
            fw.select(
                "s",
                F.col("vertex").alias("w"),
                F.col("dist").alias("dw_dist"),
                F.col("sigma").alias("sw"),
            ),
            ["s"],
        )
        .filter(
            (F.col("w") == F.col("dst"))
            & (F.col("dw_dist") == F.col("dv") + 1)
        )
        .select("s", "v", "dv", "sv", "w", "sw")
        .persist()
    )

    row = fw.agg(F.max("dist").alias("m")).collect()[0]  # 1-row scalar
    max_level = int(row["m"]) if row["m"] is not None else 0

    # -- backward: dependency accumulation, deepest level first -----------
    binit = fw.withColumn("delta", F.lit(0.0))

    def bstep(state: DataFrame, k: int) -> DataFrame:
        lvl = max_level - k  # k = 1 updates level max_level - 1
        succ = state.filter(F.col("dist") == lvl + 1).select(
            "s", F.col("vertex").alias("w"), F.col("delta").alias("dw")
        )
        term = (
            F.col("sv").cast("double") / F.col("sw").cast("double")
        ) * (F.lit(1.0) + F.col("dw"))
        upd = (
            dag.filter(F.col("dv") == lvl)
            .join(succ, ["s", "w"])
            .groupBy("s", F.col("v").alias("vertex"))
            .agg(ordered_fold_sum(term).alias("nd"))
        )
        return (
            state.join(upd, ["s", "vertex"], "left")
            .select(
                "s",
                "vertex",
                "dist",
                "sigma",
                F.coalesce(F.col("nd"), F.col("delta")).alias("delta"),
            )
        )

    bwd = SuperstepRunner(
        spark,
        op="betweenness_bwd",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_level,
        tol=-1.0,  # fixed schedule: exactly one round per DAG level
    )
    # constant delta: the level schedule is fixed, a change-count could
    # never terminate it early (louvain.py precedent)
    bres = bwd.run(binit, bstep, lambda old, new: 1.0, resume=resume)

    half = F.lit(2.0) if not directed else F.lit(1.0)
    scores = (
        bres.state.filter(F.col("dist") > 0)  # Brandes excludes v == s
        .groupBy("vertex")
        .agg((ordered_fold_sum("delta") / half).alias("betweenness"))
        .filter(F.col("betweenness") > 0.0)
    )
    dag.unpersist()
    step_edges.unpersist()
    return BetweennessResult(
        scores=scores,
        rounds=fres.supersteps + bres.supersteps,
        converged=fres.converged,
    )
