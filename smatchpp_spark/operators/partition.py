"""Balanced graph partitioning — capacity-gated label propagation
(the Spinner family: Martella, Logothetis & Siganos, ICDE 2017,
public; also JA-BE-JA / Ugander–Backstrom balanced LPA).

The operator that makes every OTHER operator cheaper at 10^12-edge
scale: assign each vertex one of ``k`` partitions so that (a) most
edges are internal — future joins shuffle less — and (b) no partition
exceeds a capacity bound — no straggler executor.  Classic LPA
optimizes (a) only and collapses to one giant label; the capacity gate
is what makes the result usable as a partitioning.

Per superstep, from the round-start assignment:

    votes(v, p) = #neighbors of v in partition p       (integer)
    load(p)     = #vertices in partition p             (k rows, tiny)
    move v → p  ⟺  p = lexicographic argmax over candidate parts by
                   (votes DESC, load ASC, part ASC)
                   AND votes(v, p) > votes(v, cur(v))   (strict gain)
                   AND load(p) < capacity
                   AND parity(v, round)                 (see below)

Everything is integer arithmetic with a total lexicographic order —
no float scores — so the trajectory is bit-identical in any engine
and the DuckDB oracle replays truncated runs 1:1 (the sssp.py
unrolling contract).

Determinism vs oscillation: synchronous LPA on bipartite-ish structure
flip-flops forever.  The parity gate (louvain.py's device) lets only
vertices with ``portable_hash64(vertex || ':' || round) % 2 == 0``
move in a given round — a deterministic coin that halves simultaneous
movers and breaks two-cycles while staying replayable.

Capacity discipline: loads are measured at round START, so a popular
target can overshoot ``capacity`` by the movers of one round — the
standard relaxation every synchronous partitioner makes (Spinner
dampens probabilistically; we gate deterministically).  Capacity is
``ceil((1+slack) · |V| / k)`` computed as an exact integer from the
Fraction of ``slack``, shipped as a plan literal.

Scale shape: one vertex-keyed join of the (pre-partitioned, static)
edge list against the round's assignment + one map-side-combined
(vertex, part) count agg per round; the k-row load table rides a
broadcast crossJoin.  State is one row per vertex.  Runs on
SuperstepRunner (checkpoint/resume + lineage + metrics).

Beyond the reference's operator set (its 20-node AMRs need no
partitioner); contract style follows operators/labelprop.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import portable_hash64
from smatchpp_spark.operators.kcore import undirected_simple
from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class PartitionResult:
    assignment: DataFrame  # (vertex, part int)
    capacity: int
    k: int
    rounds: int
    converged: bool  # a round moved nothing


def partition_stats(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """One row: (n_edges, cut_edges, cut_fraction, max_load, min_load,
    imbalance) for an assignment — the two quality axes of a balanced
    partitioning.  ``imbalance`` = max_load · k / |V| (1.0 = perfect)."""
    und = undirected_simple(edges)
    canon = und.filter(F.col("a") < F.col("b"))
    pa = assignment.select(F.col("vertex").alias("a"), F.col("part").alias("part_a"))
    pb = assignment.select(F.col("vertex").alias("b"), F.col("part").alias("part_b"))
    ecut = canon.join(pa, "a").join(pb, "b").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            (F.col("part_a") != F.col("part_b")).cast("long")
        ).alias("cut_edges"),
    )
    k = assignment.agg(F.countDistinct("part").alias("k"))
    loads = assignment.groupBy("part").agg(F.count(F.lit(1)).alias("load"))
    lstat = loads.agg(
        F.max("load").alias("max_load"),
        F.min("load").alias("min_load"),
        F.sum("load").alias("n_vertices"),
    )
    return (
        ecut.crossJoin(lstat)
        .crossJoin(k)
        .select(
            "n_edges",
            "cut_edges",
            F.round(F.col("cut_edges") / F.col("n_edges"), 9).alias(
                "cut_fraction"
            ),
            "max_load",
            "min_load",
            F.round(
                F.col("max_load") * F.col("k") / F.col("n_vertices"), 9
            ).alias("imbalance"),
        )
    )


def balanced_partition(
    edges: DataFrame,
    k: int = 4,
    slack: float = 0.05,
    max_supersteps: int = 20,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PartitionResult:
    """Partition the vertices of the undirected simple graph spanned by
    ``edges`` into ``k`` parts.  Initial assignment is
    ``portable_hash64(vertex) % k`` (near-balanced by construction);
    rounds then trade cut edges down without breaching capacity."""
    if k < 2:
        raise ValueError(f"balanced_partition: k must be >= 2, got {k}")
    if slack < 0:
        raise ValueError(f"balanced_partition: slack must be >= 0, got {slack}")
    spark = edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        undirected_simple(edges)
        .repartition(num_partitions, "a")
        .persist()
    )
    vertices = und.select(F.col("a").alias("vertex")).distinct()
    n_vertices = vertices.count()
    sl = Fraction(float(slack))  # exact value of the float
    capacity = -(
        -(sl.numerator + sl.denominator) * n_vertices // (sl.denominator * k)
    )  # ceil((1+slack)·V/k) in exact integers

    init = vertices.select(
        "vertex",
        F.pmod(portable_hash64(F.col("vertex").cast("string")), F.lit(k))
        .cast("int")
        .alias("part"),
    )

    def step(state: DataFrame, r: int) -> DataFrame:
        loads = state.groupBy("part").agg(F.count(F.lit(1)).alias("load"))
        nbr_part = state.select(
            F.col("vertex").alias("b"), F.col("part").alias("nbr_part")
        )
        votes = (
            und.join(nbr_part, "b")
            .groupBy(F.col("a").alias("vertex"), F.col("nbr_part").alias("cand"))
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        cand = votes.join(
            F.broadcast(loads.withColumnRenamed("part", "cand")), "cand"
        )
        # best candidate by (votes desc, load asc, part asc) — min of an
        # order-encoding struct, one map-side-combinable agg
        best = cand.groupBy("vertex").agg(
            F.min(
                F.struct(
                    (-F.col("votes")).alias("nv"),
                    F.col("load").alias("ld"),
                    F.col("cand").alias("pt"),
                    F.col("votes").alias("v"),
                )
            ).alias("b")
        ).select(
            "vertex",
            F.col("b.pt").alias("best_part"),
            F.col("b.v").alias("best_votes"),
            F.col("b.ld").alias("best_load"),
        )
        cur_votes = votes.withColumnRenamed("cand", "part").withColumnRenamed(
            "votes", "own_votes"
        )
        parity = (
            F.pmod(
                portable_hash64(
                    F.concat_ws(":", F.col("vertex").cast("string"), F.lit(str(r)))
                ),
                F.lit(2),
            )
            == 0
        )
        moved = (
            state.join(best, "vertex", "left")
            .join(cur_votes, ["vertex", "part"], "left")
            .select(
                "vertex",
                F.when(
                    F.col("best_part").isNotNull()
                    & (F.col("best_part") != F.col("part"))
                    & (
                        F.col("best_votes")
                        > F.coalesce("own_votes", F.lit(0))
                    )
                    & (F.col("best_load") < F.lit(capacity))
                    & parity,
                    F.col("best_part"),
                )
                .otherwise(F.col("part"))
                .cast("int")
                .alias("part"),
            )
        )
        return moved

    runner = SuperstepRunner(
        spark,
        op="balanced_partition",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )
    res = runner.run(
        init,
        step,
        lambda old, new: float(
            new.withColumnRenamed("part", "np")
            .join(old, "vertex")
            .filter(F.col("np") != F.col("part"))
            .count()
        ),
        resume=resume,
    )
    und.unpersist()
    return PartitionResult(
        assignment=res.state,
        capacity=int(capacity),
        k=k,
        rounds=res.supersteps,
        converged=res.converged,
    )
