"""Power-iteration PageRank over the global edge table.

Semantics (held to allclose 1e-6 against a numpy power-iteration oracle):
  * vertices = distinct endpoints of ``edges(src, dst)``;
  * multi-edges count with multiplicity (out-degree too);
  * dangling mass (out-degree-0 vertices) is redistributed uniformly;
  * ``rank' = (1-α)/N + α·(Σ_in contrib + dangling_mass/N)``;
  * stop at ``max |Δrank| < tol`` (default 1e-10, leaving ~4 digits of
    headroom under the 1e-6 parity bar regardless of summation order).

Physical shape per superstep (two shuffles, the Spark minimum for this
dataflow):
  1. ``ranks ⋈ contribs-table on src`` — the static side is the edge
     table pre-joined ONCE with inverse out-degree and hash-partitioned
     by ``src`` then persisted, so every iteration reuses the same
     exchange; only the (small) rank table reshuffles.
  2. ``groupBy(dst).sum`` — partial aggregation combines hub traffic
     map-side, so a 10^8-follower hub costs one row per partition, not
     one per edge.  AQE skew-join handles residual hub skew on the join.
All arithmetic is float64 end-to-end; the iteration loop (driver-side,
like the reference's climb loop solvers.py:333-351) checkpoints state
every superstep through SuperstepRunner for lineage truncation + resume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner, max_abs_delta


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex long/string, rank double)
    supersteps: int
    converged: bool
    metrics: list


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_supersteps: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    input_lineage: str = "",
) -> PageRankResult:
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    vertices = _vertices(edges).repartition(num_partitions, "vertex").persist()
    n = vertices.count()
    if n == 0:
        return PageRankResult(
            ranks=spark.createDataFrame([], "vertex long, rank double"),
            supersteps=0,
            converged=True,
            metrics=[],
        )

    out_deg = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # static per-superstep join side: one row per edge with 1/out_deg(src),
    # hash-partitioned by src once and persisted for reuse across steps
    contrib_edges = (
        edges.select("src", "dst")
        .join(out_deg.withColumnRenamed("vertex", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition(num_partitions, "src")
        .persist()
    )
    n_edges = contrib_edges.count()  # also forces the persist

    dangling = vertices.join(
        out_deg, "vertex", "left_anti"
    ).persist()  # vertices with no outgoing edges

    init = vertices.select("vertex", F.lit(1.0 / n).alias("rank"))

    def step(state: DataFrame, k: int) -> DataFrame:
        dangling_mass = (
            state.join(dangling, "vertex", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            state.withColumnRenamed("vertex", "src")
            .join(contrib_edges, "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("in_sum"))
        )
        base = (1.0 - alpha) / n + alpha * dangling_mass / n
        return vertices.join(contribs, "vertex", "left").select(
            "vertex",
            (F.lit(base) + F.lit(alpha) * F.coalesce("in_sum", F.lit(0.0))).alias(
                "rank"
            ),
        )

    runner = SuperstepRunner(
        spark,
        op="pagerank",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=tol,
        input_lineage=input_lineage,
    )
    result = runner.run(
        init,
        step,
        max_abs_delta("rank"),
        edges_processed_per_step=n_edges,
        resume=resume,
    )
    vertices.unpersist()
    contrib_edges.unpersist()
    dangling.unpersist()
    return PageRankResult(
        ranks=result.state,
        supersteps=result.supersteps,
        converged=result.converged,
        metrics=result.metrics,
    )
