"""Hash-min connected components over the (undirected view of the) edge
table.

Each superstep every vertex takes the minimum component id among itself
and its neighbors — the frontier-expansion fixpoint template the
reference uses for k-hop context growth
(smatchpp/subgraph_extraction.py:241-260), run to no-change.

Physical shape per superstep: the undirected message table
``(vertex, nbr)`` is built ONCE (both edge directions), hash-partitioned
by ``vertex`` and persisted; each step joins current labels to it and
min-aggregates — partial aggregation absorbs hub fan-in map-side.
Converges in O(max component diameter) supersteps; component id =
min vertex id in the component (exact-equality contract vs the oracle).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner, changed_count_delta


@dataclass
class ComponentsResult:
    components: DataFrame  # (vertex, component)
    supersteps: int
    converged: bool
    metrics: list


def connected_components(
    edges: DataFrame,
    max_supersteps: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    input_lineage: str = "",
) -> ComponentsResult:
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    undirected = (
        edges.select(F.col("src").alias("vertex"), F.col("dst").alias("nbr"))
        .unionByName(
            edges.select(F.col("dst").alias("vertex"), F.col("src").alias("nbr"))
        )
        .distinct()
        .repartition(num_partitions, "nbr")
        .persist()
    )
    n_msgs = undirected.count()

    vertices = undirected.select("vertex").distinct()
    init = vertices.select("vertex", F.col("vertex").alias("component"))

    def step(state: DataFrame, k: int) -> DataFrame:
        # neighbor messages: nbr's current component flows to vertex
        msgs = (
            state.withColumnRenamed("vertex", "nbr")
            .join(undirected, "nbr")
            .select("vertex", "component")
        )
        return (
            msgs.unionByName(state.select("vertex", "component"))
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
        )

    runner = SuperstepRunner(
        spark,
        op="connected_components",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
        input_lineage=input_lineage,
    )
    result = runner.run(
        init,
        step,
        changed_count_delta("component"),
        edges_processed_per_step=n_msgs,
        resume=resume,
    )
    undirected.unpersist()
    return ComponentsResult(
        components=result.state,
        supersteps=result.supersteps,
        converged=result.converged,
        metrics=result.metrics,
    )
