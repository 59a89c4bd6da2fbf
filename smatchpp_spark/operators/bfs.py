"""Multi-source BFS distances over the edge table.

Hop distance from a seed set — the crawl-depth / influence-radius
primitive of web-graph work (and the iterate-join cousin of the k-hop
subgraph extractor, subgraphs.py).  Beyond the reference's operator set,
same contract style.

Frontier algorithm: only the wave discovered in round r expands in round
r+1; discovered vertices never re-expand.  Per round that costs one join
(frontier ⋈ edges) plus one anti-join (drop already-reached) — the
frontier is the small side at every depth on power-law graphs, so the
big edge table is the only stable shuffle input and can be bucketed
(sources/bucketed.py) to drop even that.  Rounds are staged with
localCheckpoint so lineage stays flat at high depth.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BFSResult:
    distances: DataFrame  # (vertex, distance long) — reached vertices only
    rounds: int
    converged: bool  # frontier exhausted before max_depth


def bfs_distances(
    edges: DataFrame,
    sources: "list | DataFrame",
    max_depth: int = 20,
    directed: bool = True,
) -> BFSResult:
    """Hop distances from ``sources`` (list of ids or a DataFrame whose
    first column is the vertex id).  Seeds not present in the graph are
    ignored; unreached vertices are absent from the output (callers that
    want ∞ rows left-join against the vertex table)."""
    spark = edges.sparkSession
    step_edges = edges.select("src", "dst")
    if not directed:
        step_edges = step_edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
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
        frontier = vertices.join(seed, "vertex", "left_semi")
    else:
        frontier = vertices.filter(F.col("vertex").isin(list(sources)))
    frontier = frontier.localCheckpoint(eager=True)

    reached = frontier.withColumn("distance", F.lit(0).cast("long"))
    reached = reached.localCheckpoint(eager=True)
    rounds = 0
    converged = frontier.count() == 0
    while not converged and rounds < max_depth:
        rounds += 1
        nxt = (
            frontier.join(
                step_edges, frontier["vertex"] == step_edges["src"]
            )
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(reached, "vertex", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            converged = True
            break
        reached = reached.unionByName(
            nxt.withColumn("distance", F.lit(rounds).cast("long"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    step_edges.unpersist()
    return BFSResult(distances=reached, rounds=rounds, converged=converged)
