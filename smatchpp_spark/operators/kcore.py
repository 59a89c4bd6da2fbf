"""k-core decomposition by iterative peeling over the edge table.

The k-core of a graph is the maximal subgraph where every vertex has at
least ``k`` neighbors inside the subgraph — the standard web-/social-
graph density filter (dense community seeds, crawl-frontier pruning).
Beyond the reference's operator set; included because a link-graph
engine at 10^12-file scale needs a cheap densest-region primitive
(docstring contract mirrors the reference's operator-style modules,
e.g. graph_transforms.py's subgraph extractors).

Algorithm: repeat { degrees over the surviving undirected edge set →
drop vertices with degree < k → drop their edges } until a fixpoint.
Peeling is monotone (the alive set only shrinks), so the fixpoint IS the
k-core regardless of evaluation order.

100 TB shape per round: one map-side-combined degree aggregation plus
two semi-joins on the (src / dst) keys — the same two-exchange budget as
a PageRank superstep; the surviving edge set is localCheckpoint-staged
every round so lineage stays flat over many rounds.  Degrees count
DISTINCT neighbors (simple-graph semantics): multi-edges collapse in the
undirected edge view.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import (
    SuperstepRunner,
    observed_row_count_delta,
)


@dataclass
class KCoreResult:
    vertices: DataFrame  # (vertex,) — members of the k-core
    rounds: int
    converged: bool


def undirected_simple(edges: DataFrame) -> DataFrame:
    """Distinct undirected neighbor pairs, self-loops dropped: one row
    (a, b) per direction per neighbor relation."""
    return (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KCoreResult:
    """Vertices of the k-core.  Early-stops at the fixpoint (no vertex
    lost in a round); otherwise runs ``max_rounds`` and reports
    ``converged=False`` with the partially-peeled set — an upper bound on
    the true core, never an under-approximation.

    Runs through SuperstepRunner: per-round state (the surviving edge
    set) checkpoints under ``checkpoint_dir`` with metrics + lineage and
    resumes mid-peel, same contract as pagerank/components/labelprop.
    The stop test is the EDGE-row count delta: every alive vertex
    carries ≥1 edge row, so the edge set is unchanged iff no vertex was
    peeled — a fixpoint."""
    spark = edges.sparkSession
    init = undirected_simple(edges)

    def step(state: DataFrame, _round: int) -> DataFrame:
        deg = state.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("a").alias("v"))
        return attach(
            state,
            state.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b"),
        )

    # edge rows only shrink; the count of the new state is observed
    # inside the materialization job, so each round runs ZERO extra jobs
    # (previously one memoized count job per round)
    attach = observed_row_count_delta(sign=1)
    delta = None

    runner = SuperstepRunner(
        spark,
        op=f"kcore_{k}",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_rounds,
        tol=0.0,
    )
    res = runner.run(init, step, delta, resume=resume)
    return KCoreResult(
        vertices=res.state.select(F.col("a").alias("vertex")).distinct(),
        rounds=res.supersteps,
        converged=res.converged,
    )


@dataclass
class CorenessResult:
    coreness: DataFrame  # (vertex, coreness long)
    rounds: int
    converged: bool


def coreness(
    edges: DataFrame,
    max_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> CorenessResult:
    """FULL core decomposition — every vertex's core number at once —
    via the distributed h-index iteration (Lü-Zhou-Zhang-Stanley 2016,
    public): start from ``h = degree`` and repeatedly set ``h(v)`` to
    the H-index of its neighbors' current values (the largest m such
    that at least m neighbors have h ≥ m).  The sequence is monotone
    non-increasing and converges exactly to the coreness; a fixed-k
    ``k_core`` membership is then just ``coreness ≥ k``.

    Round invariant (oracle-replay contract): after k rounds the
    (vertex, h) table is identical in any engine replaying the same
    update — the sssp/mis 1:1 unrolling argument (monotonicity makes
    extra rounds past the fixpoint no-ops).

    Scale shape at 100 TB: per round one state⋈edges message join, then
    the H-index WITHOUT a hub-degree sort: first a map-side-combinable
    histogram ``groupBy(vertex, nbr_h).count()`` collapses a hub's 10^8
    message rows to one row per distinct neighbor-h value, then a
    descending cumulative count over the compacted histogram gives
    ``H = max over distinct t of min(t, #neighbors with h >= t)``
    (equality with the classic row_number form: if min(t, cum(t)) = m
    then cum(m) >= cum(t) >= m so m <= H; conversely the smallest
    distinct value t* >= H has cum(t*) = cum(H) >= H).  The cumulative
    window's partition is the DISTINCT-value set, bounded by the number
    of distinct h values in the graph — at most ~2*sqrt(m) in round 1
    (h = degree; distinct degree values sum to <= 2m) and shrinking with
    h every round — so a 10^8-degree hub costs a ~10^3-row window task,
    not a 10^8-row sort.  prev-h rides the state so the convergence
    delta is a scan, not a join (hits.py pattern).
    """
    spark = edges.sparkSession
    ue = (
        undirected_simple(edges)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .persist()
    )
    deg = (
        ue.groupBy(F.col("src").alias("vertex"))
        .agg(F.count(F.lit(1)).alias("h"))
    )
    init = deg.select(
        "vertex",
        F.col("h").cast("long").alias("h"),
        F.lit(None).cast("long").alias("prev_h"),
    )

    from pyspark.sql import Window

    def step(state: DataFrame, _r: int) -> DataFrame:
        msgs = (
            ue.join(
                state.select(
                    F.col("vertex").alias("src"), F.col("h").alias("nbr_h")
                ),
                "src",
            )
            .select(F.col("dst").alias("vertex"), "nbr_h")
        )
        # histogram first: map-side combine collapses hub fan-in to one
        # row per distinct neighbor-h value before any per-vertex window
        hist = msgs.groupBy("vertex", "nbr_h").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = (
            Window.partitionBy("vertex")
            .orderBy(F.col("nbr_h").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        hidx = (
            hist.withColumn("cum", F.sum("c").over(w))
            .groupBy("vertex")
            .agg(F.max(F.least(F.col("nbr_h"), F.col("cum"))).alias("new_h"))
        )
        from pyspark.sql import Observation

        new_state = (
            state.join(hidx, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("new_h", F.lit(0)).cast("long").alias("h"),
                F.col("h").alias("prev_h"),
            )
        )
        # changed-h count observed inside the materialization job (the
        # previous inline delta re-scanned the state in a separate job)
        obs = Observation()
        new_state = new_state.observe(
            obs,
            F.sum(
                (
                    F.col("prev_h").isNull()
                    | (F.col("h") != F.col("prev_h"))
                ).cast("long")
            ).alias("delta"),
        )
        return new_state, obs, (lambda m: float(m["delta"] or 0))

    runner = SuperstepRunner(
        spark,
        op="coreness",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )
    res = runner.run(
        init,
        step,
        None,
        resume=resume,
    )
    ue.unpersist()
    return CorenessResult(
        coreness=res.state.select("vertex", F.col("h").alias("coreness")),
        rounds=res.supersteps,
        converged=res.converged,
    )


def core_histogram(
    edges: DataFrame,
    max_supersteps: int = 50,
) -> DataFrame:
    """Core-number distribution + degeneracy summary: one row per core
    value ``(coreness, n_vertices, is_degeneracy)`` — the standard
    one-look density profile of a web graph (the degeneracy row is the
    graph's largest k with a non-empty k-core, i.e. the max coreness).
    A map-side-combined groupBy over the ``coreness`` fixpoint plus a
    1-row max attached by crossJoin — no extra iteration.
    """
    c = coreness(edges, max_supersteps=max_supersteps).coreness
    hist = c.groupBy("coreness").agg(F.count(F.lit(1)).alias("n_vertices"))
    degeneracy = hist.agg(F.max("coreness").alias("_deg"))
    return hist.crossJoin(degeneracy).select(
        "coreness",
        "n_vertices",
        (F.col("coreness") == F.col("_deg")).alias("is_degeneracy"),
    )
