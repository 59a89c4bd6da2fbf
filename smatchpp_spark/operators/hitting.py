"""Truncated hitting time to a target set.

``h(v) = E[min(τ_T, K)]`` — the expected number of uniform-random-walk
steps from ``v`` until the walk first enters the target set ``T``,
truncated at horizon ``K`` (Sarkar & Moore 2007: the truncation makes
hitting time local, tractable, and robust to the long-range noise that
makes untruncated hitting times degenerate on large graphs).  A small
``h`` means ``v`` is tightly connected to ``T`` — the random-walk
proximity used for recommendation and near-neighbor ranking.

Value iteration, exactly K supersteps:

  h⁰(v)    = 0
  hᵏ⁺¹(v)  = 0                          v ∈ T
           = 1 + hᵏ(v)                  v ∉ T, no out-edges (a stuck
                                        walk never hits: h → K)
           = 1 + Σ_u P(v,u) · hᵏ(u)     otherwise (P uniform over
                                        out-edges, multi-edge
                                        multiplicity)

Same physical shape as pagerank.py: the static contrib side (edge,
1/out-degree) is hash-partitioned by src once and persisted; each
superstep shuffles only the |V|-row state into the join and combines
the dst aggregation map-side.  State checkpoints through
SuperstepRunner (lineage truncation + resume + metrics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class HittingTimeResult:
    times: DataFrame  # (vertex, hitting_time double in [0, K])
    supersteps: int
    metrics: list


def hitting_times(
    edges: DataFrame,
    targets: DataFrame,
    horizon: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    input_lineage: str = "",
) -> HittingTimeResult:
    """``targets``'s first column is the target vertex set; targets not
    present in the graph are ignored (they are unreachable by a walk on
    ``edges`` anyway)."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    t = (
        targets.select(F.col(targets.columns[0]).alias("vertex"))
        .distinct()
        .withColumn("is_target", F.lit(True))
    )
    out_deg = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    vertices = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .join(out_deg, "vertex", "left")
        .join(t, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("is_target", F.lit(False)).alias("is_target"),
            F.col("out_deg").isNull().alias("stuck"),
        )
        .repartition(num_partitions, "vertex")
        .persist()
    )
    n = vertices.count()
    if n == 0:
        return HittingTimeResult(
            times=spark.createDataFrame([], "vertex string, hitting_time double"),
            supersteps=0,
            metrics=[],
        )

    contrib_edges = (
        edges.select("src", "dst")
        .join(out_deg.withColumnRenamed("vertex", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition(num_partitions, "src")
        .persist()
    )
    n_edges = contrib_edges.count()

    init = vertices.select(
        "vertex", "is_target", "stuck", F.lit(0.0).alias("h")
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        # expectation flows BACKWARD along edges: v's new value averages
        # its out-neighbors' old values, so the contrib join pivots on
        # dst and aggregates to src
        nbr = (
            state.select(F.col("vertex").alias("dst"), "h")
            .join(contrib_edges, "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum(F.col("h") * F.col("w")).alias("nbr_h"))
        )
        return (
            state.select("vertex", "is_target", "stuck", F.col("h").alias("old_h"))
            .join(nbr, "vertex", "left")
            .select(
                "vertex",
                "is_target",
                "stuck",
                F.when(F.col("is_target"), F.lit(0.0))
                .when(F.col("stuck"), F.lit(1.0) + F.col("old_h"))
                .otherwise(
                    F.lit(1.0) + F.coalesce("nbr_h", F.lit(0.0))
                )
                .alias("h"),
            )
        )

    runner = SuperstepRunner(
        spark,
        op="hitting_times",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=horizon,
        tol=-1.0,  # fixed K iterations: h^K IS the truncated definition
        input_lineage=input_lineage,
    )
    result = runner.run(
        init,
        step,
        # delta is informational (monotone increase off targets)
        lambda old, new: float("inf"),
        edges_processed_per_step=n_edges,
        resume=resume,
    )
    vertices.unpersist()
    contrib_edges.unpersist()
    return HittingTimeResult(
        times=result.state.select("vertex", F.col("h").alias("hitting_time")),
        supersteps=result.supersteps,
        metrics=result.metrics,
    )
