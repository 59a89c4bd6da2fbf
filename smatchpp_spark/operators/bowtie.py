"""Bow-tie decomposition of a directed graph — the classic macroscopic
web-structure map (Broder et al., WWW 2000, public): every vertex falls
in exactly one of

  * ``CORE``          — the largest strongly connected component;
  * ``IN``            — reaches the core, not in it;
  * ``OUT``           — reachable from the core, not in it;
  * ``TUBE``          — on an IN→OUT path that bypasses the core
                        (reachable from IN and reaches OUT);
  * ``TENDRIL``       — hangs off IN (reachable from IN, doesn't reach
                        OUT) or into OUT (reaches OUT, not reachable
                        from IN);
  * ``DISCONNECTED``  — none of the above (other weak components).

The taxonomy needs no "avoid the core" path logic: anything reachable
from IN *through* the core is already OUT (the core reaches it), and
anything reaching OUT through the core is already IN — so plain
forward/backward reachability flags classify exactly.

Composition of audited operators (the standard distributed recipe):
ONE SCC run (operators/scc.py FW-BW-MIN) + FOUR multi-source BFS passes
(operators/bfs.py: forward/backward from the core, forward from IN,
backward from OUT — each is frontier⋈edges+anti-join supersteps, cost
bounded by the reached ball) + one argmax aggregation for the core
label + vertex-keyed flag joins.  Nothing here introduces a new
shuffle pattern; at web scale the SCC peel dominates, exactly as
published MapReduce/Pregel bow-tie studies report.

Determinism: the core is the largest SCC, ties broken by minimum SCC
label — a total order, so both engines pick the same core.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.bfs import bfs_distances
from smatchpp_spark.operators.scc import strongly_connected_components

COMPONENTS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISCONNECTED")


@dataclass
class BowtieResult:
    membership: DataFrame  # (vertex, component string, scc)
    core_label: object  # the core SCC's label (min vertex id in it)
    core_size: int


def bowtie_decomposition(
    edges: DataFrame,
    max_scc_rounds: int = 20,
    max_depth: int = 50,
    checkpoint_dir: str | None = None,
) -> BowtieResult:
    """Classify every vertex of ``edges(src, dst)`` into the six Broder
    classes.  ``max_depth`` bounds each BFS pass (vertices beyond it
    classify as if unreachable — callers size it to the graph's
    effective diameter, which double_sweep_diameter / hyperball
    estimate); ``max_scc_rounds`` passes through to the SCC peel."""
    scc = strongly_connected_components(
        edges, max_rounds=max_scc_rounds, checkpoint_dir=checkpoint_dir
    ).components

    # core = largest SCC, ties by min label — one aggregation, one row
    top = (
        scc.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .collect()
    )
    if not top:
        spark = edges.sparkSession
        empty = spark.createDataFrame(
            [], "vertex string, component string, scc string"
        )
        return BowtieResult(membership=empty, core_label=None, core_size=0)
    core_label, core_size = top[0]["scc"], top[0]["n"]
    core = scc.filter(F.col("scc") == F.lit(core_label)).select("vertex")

    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )

    def reached(e: DataFrame, seeds: DataFrame) -> DataFrame:
        return bfs_distances(
            e, seeds, max_depth=max_depth, directed=True
        ).distances.select("vertex")

    # every reached() result is a localCheckpoint scan (SuperstepRunner
    # materializes state), so reuse across joins re-reads blocks, not plans
    fwd_core = reached(edges, core)             # core ∪ OUT
    bwd_core = reached(rev, core)               # core ∪ IN
    in_set = bwd_core.join(core, "vertex", "left_anti")
    out_set = fwd_core.join(core, "vertex", "left_anti")
    from_in = reached(edges, in_set)            # IN's forward ball
    to_out = reached(rev, out_set)              # OUT's backward ball

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.withColumn(name, F.lit(True))

    m = (
        scc.join(flag(core, "is_core"), "vertex", "left")
        .join(flag(bwd_core, "f_bwd"), "vertex", "left")
        .join(flag(fwd_core, "f_fwd"), "vertex", "left")
        .join(flag(from_in, "f_from_in"), "vertex", "left")
        .join(flag(to_out, "f_to_out"), "vertex", "left")
    )
    c = lambda n: F.coalesce(F.col(n), F.lit(False))  # noqa: E731
    membership = m.select(
        "vertex",
        F.when(c("is_core"), F.lit("CORE"))
        .when(c("f_bwd"), F.lit("IN"))
        .when(c("f_fwd"), F.lit("OUT"))
        .when(c("f_from_in") & c("f_to_out"), F.lit("TUBE"))
        .when(c("f_from_in") | c("f_to_out"), F.lit("TENDRIL"))
        .otherwise(F.lit("DISCONNECTED"))
        .alias("component"),
        "scc",
    )
    return BowtieResult(
        membership=membership, core_label=core_label, core_size=core_size
    )
