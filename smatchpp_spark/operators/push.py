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
