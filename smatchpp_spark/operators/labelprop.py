"""Synchronous label propagation (community detection) over the
undirected edge view.

Each superstep every vertex adopts the most frequent label among its
neighbors, ties broken by the smallest label — the distributed analog of
the reference's majority-Counter pattern (smatchpp/align.py:22-41), made
deterministic so two runs (and two cluster sizes) produce identical
labels.

Physical shape: messages = labels ⋈ undirected edges (one shuffle),
then ``groupBy(vertex, label).count`` (partial-agg absorbs hub fan-in)
and a max-votes/min-label pick via two more partial-aggregable groupBys
joined on the already-shuffled vertex key — no window, no per-vertex
sort.  Synchronous LPA can oscillate on bipartite structures, so
the loop stops at no-change OR the superstep cap, whichever first; the
cap is part of the operator contract (oracle runs the same).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class LabelPropResult:
    labels: DataFrame  # (vertex, label)
    supersteps: int
    converged: bool
    metrics: list


def label_propagation(
    edges: DataFrame,
    max_supersteps: int = 20,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    input_lineage: str = "",
    weight_col: str | None = None,
) -> LabelPropResult:
    """``weight_col`` switches to WEIGHTED label propagation: a neighbor
    votes with its edge weight instead of 1 (parallel and reverse-
    duplicate edges SUM their weights — the standard collapse).  Weights
    must be positive; integer-valued weights keep the distributed vote
    sums float-exact, so ties stay deterministic cross-engine (same
    reasoning as weighted PageRank's quantity weights)."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # one exchange builds the message table in its final layout (see
    # connected_components: hashpartitioning on the subset key ``nbr``
    # satisfies the dedup/weight-sum aggregation's clustering, so the
    # old distinct/groupBy-then-repartition double shuffle collapses to
    # one), pre-sorted by the join key so the cached side never re-sorts
    # under a per-superstep sort-merge join.
    if weight_col is None:
        undirected = (
            edges.select(F.col("src").alias("vertex"), F.col("dst").alias("nbr"))
            .unionByName(
                edges.select(F.col("dst").alias("vertex"), F.col("src").alias("nbr"))
            )
            .repartition(num_partitions, "nbr")
            .dropDuplicates(["vertex", "nbr"])
            .sortWithinPartitions("nbr")
            .persist()
        )
    else:
        undirected = (
            edges.select(
                F.col("src").alias("vertex"),
                F.col("dst").alias("nbr"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .unionByName(
                edges.select(
                    F.col("dst").alias("vertex"),
                    F.col("src").alias("nbr"),
                    F.col(weight_col).cast("double").alias("w"),
                )
            )
            .repartition(num_partitions, "nbr")
            .groupBy("vertex", "nbr")
            .agg(F.sum("w").alias("w"))
            .sortWithinPartitions("nbr")
            .persist()
        )
    n_msgs = undirected.count()
    vertices = undirected.select("vertex").distinct()
    init = vertices.select("vertex", F.col("vertex").alias("label"))

    def step(state: DataFrame, k: int):
        # MERGE hint: the label side is V rows — broadcasting it every
        # superstep (what size-based planning picks at bench scale)
        # re-serializes and re-ships the whole state per step and loses
        # to a sort-merge join against the cached, pre-sorted message
        # table (measured 9.8s -> 7.8s on the 600k-edge bench; at web
        # scale a V-row broadcast is impossible anyway, so the hint
        # makes local behavior match the scale shape)
        msgs = state.select(
            F.col("vertex").alias("nbr"), "label"
        ).hint("merge").join(undirected, "nbr")
        if weight_col is None:
            counted = msgs.select("vertex", "label").groupBy(
                "vertex", "label"
            ).agg(F.count(F.lit(1)).alias("votes"))
        else:
            counted = msgs.select("vertex", "label", "w").groupBy(
                "vertex", "label"
            ).agg(F.sum("w").alias("votes"))
        # most votes wins; ties -> smallest label (deterministic).  One
        # partial-aggregable groupBy: min over struct(-votes, label) is
        # lexicographic — highest vote count first, then the smallest
        # label — and works for ANY orderable label type (strings
        # included; only the vote count is negated, never the label).
        # Replaces the previous max-join-min chain (two extra shuffles
        # per superstep); still map-side-combinable, so a hub vertex
        # with 10^8 neighbors never concentrates rows in one task.
        picked = (
            counted.groupBy("vertex")
            .agg(
                F.min(
                    F.struct((-F.col("votes")).alias("neg_votes"), F.col("label"))
                ).alias("best")
            )
            .select("vertex", F.col("best.label").alias("label"))
        )
        # isolated vertices (no messages) keep their label; the previous
        # label rides along so the changed-label convergence count is a
        # free Observation on the materialization job instead of a
        # separate old⋈new join + count job per superstep
        new_state = state.select("vertex", "label").join(
            picked.withColumnRenamed("label", "_new").hint("merge"),
            "vertex",
            "left",
        ).select(
            "vertex",
            F.coalesce(F.col("_new"), F.col("label")).alias("label"),
            F.col("label").alias("_prev"),
        )
        obs = Observation()
        new_state = new_state.observe(
            obs,
            F.sum((F.col("label") != F.col("_prev")).cast("long")).alias("delta"),
        )
        return new_state, obs, lambda m: float(m["delta"] or 0)

    runner = SuperstepRunner(
        spark,
        op="label_propagation",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
        input_lineage=input_lineage,
    )
    result = runner.run(
        init,
        step,
        None,
        edges_processed_per_step=n_msgs,
        resume=resume,
    )
    undirected.unpersist()
    return LabelPropResult(
        labels=result.state.select("vertex", "label"),
        supersteps=result.supersteps,
        converged=result.converged,
        metrics=result.metrics,
    )
