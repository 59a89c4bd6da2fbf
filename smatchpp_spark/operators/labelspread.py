"""Harmonic label spreading — semi-supervised scores over the link graph.

Zhu, Ghahramani & Lafferty (ICML 2003, public): given a small labeled
seed set (positive / negative), the harmonic function assigns every
unlabeled vertex the average of its neighbors' scores, with seeds
CLAMPED to their labels each round — the fixpoint is the unique
harmonic extension, the probability a random walk from the vertex hits
a positive seed before a negative one.  On web graphs this is the
classic trust/spam-mass propagation primitive (TrustRank's sibling —
clamped absorbing states instead of teleport bias).

Physical shape per superstep — one PageRank half-step on the
degree-normalized undirected simple graph:

    state ⋈ edges on src → map-side-combined avg per dst →
    seed-clamp merge (left join with the broadcastable seed table)

The static edge side is pre-joined once with 1/degree and
hash-partitioned; only the V-row score table reshuffles.  Scores are
monotone-bounded in [0, 1]; ``tol=-1`` gives the fixed-iteration
oracle-replayable form.  SuperstepRunner checkpoint/resume/metrics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import (
    SuperstepRunner,
    free_local_checkpoint,
    observe_scan_delta,
)


@dataclass
class LabelSpreadResult:
    scores: DataFrame  # (vertex, score double, is_seed boolean)
    supersteps: int
    converged: bool
    metrics: list


def harmonic_label_spread(
    edges: DataFrame,
    pos_seeds: "list | DataFrame",
    neg_seeds: "list | DataFrame",
    max_supersteps: int = 30,
    tol: float = 1e-9,
    init_score: float = 0.5,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> LabelSpreadResult:
    """Harmonic scores in [0, 1] over the undirected simple graph:
    positive seeds clamp to 1.0, negative to 0.0, everyone else starts
    at ``init_score`` and converges to the mean of its neighbors.
    A vertex in both seed sets raises ValueError.  Seeds not present
    in the edge table are ignored (they have no neighbors to spread
    to).  Stop when ``max |Δscore| <= tol`` or after
    ``max_supersteps`` (``tol=-1`` for exactly-k oracle replays)."""
    from smatchpp_spark.operators.kcore import undirected_simple

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _seed_df(s: "list | DataFrame") -> DataFrame:
        if isinstance(s, DataFrame):
            return s.select(F.col(s.columns[0]).alias("vertex")).distinct()
        # infer the vertex type from the values (long ids stay long —
        # a string-typed seed table would break the ANSI-mode join)
        return (
            spark.createDataFrame([(v,) for v in s], ["vertex"]).distinct()
        )

    und = (
        undirected_simple(edges)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # static contrib side: edge pre-joined with the DESTINATION-side
    # 1/degree (the harmonic update divides by the receiver's degree)
    e = (
        und.join(
            deg.select(F.col("src").alias("dst"), F.col("d").alias("dst_deg")),
            "dst",
        )
        .repartition(num_partitions, "src")
        .persist()
    )
    e.count()

    vertices = deg.select(F.col("src").alias("vertex"))
    pos = _seed_df(pos_seeds).join(vertices, "vertex", "left_semi")
    neg = _seed_df(neg_seeds).join(vertices, "vertex", "left_semi")
    if pos.join(neg, "vertex", "left_semi").count() > 0:
        e.unpersist()
        raise ValueError(
            "harmonic_label_spread: a vertex appears in both seed sets"
        )
    seeds = (
        pos.select("vertex", F.lit(1.0).alias("seed_score"))
        .unionByName(neg.select("vertex", F.lit(0.0).alias("seed_score")))
        .localCheckpoint(eager=True)
    )

    init = (
        vertices.join(seeds, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("seed_score", F.lit(float(init_score))).alias("score"),
            F.lit(float("nan")).alias("prev_score"),
        )
    )

    step_ckpts: list[DataFrame] = []

    def _free() -> None:
        while step_ckpts:
            free_local_checkpoint(step_ckpts.pop())

    def step(state: DataFrame, k: int) -> DataFrame:
        _free()
        avg = (
            state.select(F.col("vertex").alias("src"), "score")
            .join(e, "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(
                (F.sum(F.col("score") / F.col("dst_deg"))).alias("nbr_avg")
            )
        )
        nxt = (
            state.select("vertex", F.col("score").alias("prev_score"))
            .join(avg, "vertex", "left")
            .join(seeds, "vertex", "left")
            .select(
                "vertex",
                F.coalesce(
                    "seed_score",
                    F.coalesce("nbr_avg", F.lit(float(init_score))),
                ).alias("score"),
                "prev_score",
            )
        )
        # convergence scan observed in the materialization job
        return observe_scan_delta(
            nxt, F.max(F.abs(F.col("score") - F.col("prev_score")))
        )

    runner = SuperstepRunner(
        spark,
        op="harmonic_label_spread",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
    )
    res = runner.run(init, step, None, resume=resume)
    _free()
    out = res.state.join(seeds, "vertex", "left").select(
        "vertex",
        "score",
        F.col("seed_score").isNotNull().alias("is_seed"),
    )
    # NB: seeds stays checkpointed — the returned scores DataFrame
    # references it and a freed localCheckpoint cannot recompute
    e.unpersist()
    return LabelSpreadResult(
        scores=out,
        supersteps=res.supersteps,
        converged=res.converged,
        metrics=res.metrics,
    )
