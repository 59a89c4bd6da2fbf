"""Approximate personalized PageRank by synchronous forward push —
local computation on the undirected simple graph (Andersen, Chung &
Lang, FOCS 2006, public; the engine behind local clustering and
sublinear PPR at web scale).

Forward push maintains per-vertex (estimate p, residual r) with
``r(seed) = 1`` initially.  A push at v converts ``α·r(v)`` into
``p(v)`` and spreads ``(1−α)·r(v)/d(v)`` to each neighbor.  This
SYNCHRONOUS variant pushes EVERY active vertex (``r(v) ≥ eps·d(v)``)
per superstep:

    p'(v) = p(v) + α·r(v)·[v active]
    r'(v) = r(v)·[v inactive] + Σ_{u~v, u active} (1−α)·r(u)/d(u)

Exact invariants (tested, not just cited):
  * mass conservation — ``Σp + Σr = 1`` after every round (a push moves
    α of the residual into p and keeps (1−α) as downstream residual);
  * ``ppr(s,·) = p + Σ_u r(u)·ppr(u,·)`` — so when the stop rule
    ``max_v r(v)/d(v) < eps`` holds, p underestimates ppr by at most
    ``eps·d(v)`` per vertex (the ACL06 degree-normalized bound).

Scale shape: work per superstep is Σ_{active} d(v) — the defining
property of push (total work O(1/(eps·α)) INDEPENDENT of graph size),
versus power iteration's per-step full |E|.  One static contrib side
(pre-partitioned once, the pagerank.py pattern), one join + map-side-
combined sum per round; the active set is a column predicate, not a
driver-side loop.  Round-k state is a pure function of round k−1's, so
the SQL oracle replays truncated runs 1:1 (the sssp.py unrolling
contract).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.kcore import undirected_simple
from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class PushResult:
    # (vertex, p double, r double, degree long) — TOUCHED vertices only
    # (p > 0 or r > 0); untouched vertices have exactly (0, 0) and are
    # not materialized, which is what keeps push local
    state: DataFrame
    supersteps: int
    converged: bool  # no active vertex remains


def ppr_push(
    edges: DataFrame,
    seed,
    alpha: float = 0.15,
    eps: float = 1e-4,
    max_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PushResult:
    """Push-based PPR from ``seed`` over the undirected simple graph
    spanned by ``edges`` (undirected ⇒ every vertex has degree ≥ 1 ⇒
    no dangling residual).  ``alpha`` is the TELEPORT probability (the
    ACL06 convention — note pagerank.py's ``alpha`` is the damping
    factor, its complement).  A seed absent from the graph raises."""
    if not 0 < alpha < 1:
        raise ValueError(f"ppr_push: alpha must be in (0,1), got {alpha}")
    if eps <= 0:
        raise ValueError(f"ppr_push: eps must be > 0, got {eps}")
    spark = edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = undirected_simple(edges)  # (a, b) both directions, distinct
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    degv = deg.select(F.col("a").alias("b"), F.col("degree").alias("dv"))
    contrib = (
        und.join(deg, "a")
        .join(degv, "b")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            (F.lit(1.0) / F.col("degree")).alias("w"),
            "dv",
        )
        .repartition(num_partitions, "u")
        .persist()
    )
    contrib.count()

    vt = und.schema["a"].dataType
    seed_lit = F.lit(seed).cast(vt)
    seed_rows = deg.filter(F.col("a") == seed_lit).collect()
    if not seed_rows:
        contrib.unpersist()
        raise ValueError(f"ppr_push: seed {seed!r} not in graph")
    seed_deg = seed_rows[0]["degree"]

    # SPARSE state — one row per TOUCHED vertex only, the property that
    # makes push local: per-round cost is O(touched set), never O(|V|).
    # Receivers' degrees ride the static contrib rows (dv), so newly
    # touched vertices need no per-round join against the degree table.
    init = spark.createDataFrame(
        [(str(seed), 0.0, 1.0, int(seed_deg))],
        "vertex string, p double, r double, degree long",
    ).select(
        F.col("vertex").cast(vt).alias("vertex"), "p", "r", "degree"
    )

    active_pred = F.col("r") >= F.lit(eps) * F.col("degree")

    def step(state: DataFrame, k: int) -> DataFrame:
        act = state.filter(active_pred).select(
            F.col("vertex").alias("u"), F.col("r").alias("ru")
        )
        # incoming pushed residual per vertex — map-side combined; dv
        # (receiver degree) is constant per v, first() reads it free
        pushed = (
            act.join(contrib, "u")
            .groupBy(F.col("v").alias("vertex"))
            .agg(
                F.sum(F.lit(1.0 - alpha) * F.col("ru") * F.col("w")).alias(
                    "r_in"
                ),
                F.first("dv").alias("dv"),
            )
        )
        merged = state.join(pushed, "vertex", "full")
        was_active = F.col("r").isNotNull() & (
            F.col("r") >= F.lit(eps) * F.col("degree")
        )
        return merged.select(
            "vertex",
            F.when(was_active, F.coalesce("p", F.lit(0.0)) + F.lit(alpha) * F.col("r"))
            .otherwise(F.coalesce("p", F.lit(0.0)))
            .alias("p"),
            (
                F.when(was_active, F.lit(0.0))
                .otherwise(F.coalesce("r", F.lit(0.0)))
                + F.coalesce("r_in", F.lit(0.0))
            ).alias("r"),
            F.coalesce("degree", "dv").alias("degree"),
        )

    runner = SuperstepRunner(
        spark,
        op="ppr_push",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )
    res = runner.run(
        init,
        step,
        lambda old, new: float(new.filter(active_pred).count()),
        resume=resume,
    )
    contrib.unpersist()
    return PushResult(
        state=res.state,
        supersteps=res.supersteps,
        converged=res.converged,
    )


@dataclass
class SweepResult:
    # community members: (vertex, rank, size, cut_edges, min_volume,
    # conductance) — the scalar stats repeat on every row
    members: DataFrame
    # full sweep curve: (vertex, rank, score, degree, vol, internal,
    # cut, min_volume) — one row per touched vertex
    sweep: DataFrame
    supersteps: int
    converged: bool


def sweep_cut(edges: DataFrame, state: DataFrame) -> DataFrame:
    """The conductance sweep curve over a push-PPR ``state`` (the ACL06
    second half: order touched vertices by ``p/degree`` and scan
    prefixes).  For prefix S_i of the ordering:

        vol_i      = Σ_{v ∈ S_i} deg(v)          (cumulative degrees)
        internal_i = #{edges inside S_i}          (cumulative: an edge
                     becomes internal at the LARGER of its two ranks)
        cut_i      = vol_i − 2·internal_i
        φ_i        = cut_i / min(vol_i, vol(G) − vol_i)

    All counts are exact integers; φ is one IEEE double division, so
    the curve is bit-identical across engines.  The global window is
    DELIBERATE scale-wise: push touches O(1/(eps·alpha)) vertices
    independent of graph size, so the sweep operates on a provably
    small set — locality is the algorithm's contract, not a hope.
    Untouched vertices have rank ∞ (absent) and can never be internal,
    so the edge join against the rank table is an inner join that
    discards the rest of the graph immediately."""
    from pyspark.sql import Window

    und = undirected_simple(edges).persist()
    vol_total = und.count()  # Σ deg over the WHOLE graph = |und| rows
    w_rank = Window.orderBy(F.col("score").desc(), F.col("vertex").asc())
    ranked = state.select(
        "vertex",
        "degree",
        (F.col("p") / F.col("degree")).alias("score"),
    ).withColumn("rank", F.row_number().over(w_rank))
    ra = ranked.select(F.col("vertex").alias("a"), F.col("rank").alias("ra"))
    rb = ranked.select(F.col("vertex").alias("b"), F.col("rank").alias("rb"))
    closed = (
        und.join(ra, "a")
        .join(rb, "b")
        .filter(F.col("ra") > F.col("rb"))
        .groupBy(F.col("ra").alias("rank"))
        .agg(F.count(F.lit(1)).alias("closed"))
    )
    w_cum = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = (
        ranked.join(closed, "rank", "left")
        .withColumn("vol", F.sum("degree").over(w_cum))
        .withColumn(
            "internal",
            F.sum(F.coalesce("closed", F.lit(0))).over(w_cum),
        )
        .withColumn("cut", F.col("vol") - 2 * F.col("internal"))
        .withColumn(
            "min_volume",
            F.least(F.col("vol"), F.lit(vol_total) - F.col("vol")),
        )
        .select(
            "vertex", "rank", "score", "degree", "vol", "internal",
            "cut", "min_volume",
        )
    )
    und.unpersist()
    return sweep


def local_community(
    edges: DataFrame,
    seed,
    alpha: float = 0.15,
    eps: float = 1e-4,
    max_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> SweepResult:
    """Local community detection around ``seed``: push-PPR then the
    minimum-conductance sweep cut (Andersen–Chung–Lang local
    clustering, end to end).  The community is the prefix minimizing
    φ (ties → the smaller prefix); prefixes with
    ``min(vol, vol(G)−vol) = 0`` are excluded (a cut needs two sides).
    Total cost: the push (O(1/(eps·alpha)) work) + one edge join
    against the touched set + a window over the touched set — never a
    pass proportional to |V| beyond the one static degree build that
    push already does."""
    r = ppr_push(
        edges,
        seed,
        alpha=alpha,
        eps=eps,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    sweep = sweep_cut(edges, r.state).localCheckpoint(eager=True)
    best = (
        sweep.filter(F.col("min_volume") > 0)
        .select(
            F.col("rank").alias("best_size"),
            F.col("cut").alias("best_cut"),
            F.col("min_volume").alias("best_minvol"),
            (F.col("cut") / F.col("min_volume")).alias("phi"),
        )
        .orderBy(F.col("phi").asc(), F.col("best_size").asc())
        .limit(1)
    )
    members = (
        sweep.crossJoin(F.broadcast(best))
        .filter(F.col("rank") <= F.col("best_size"))
        .select(
            "vertex",
            "rank",
            F.col("best_size").alias("size"),
            F.col("best_cut").alias("cut_edges"),
            F.col("best_minvol").alias("min_volume"),
            F.round("phi", 9).alias("conductance"),
        )
    )
    return SweepResult(
        members=members,
        sweep=sweep,
        supersteps=r.supersteps,
        converged=r.converged,
    )
