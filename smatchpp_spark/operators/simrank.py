"""SimRank similarity via coupled reverse random walks (Monte Carlo).

SimRank (Jeh & Widom KDD'02, public): two nodes are similar if their
in-neighbors are similar — the fixpoint of

    S(a,b) = C / (|I(a)||I(b)|) · Σ_{x∈I(a), y∈I(b)} S(x,y),  S(a,a)=1.

Fogaras & Rácz (WWW'05, public) give the scalable estimator this module
implements: S(a,b) = E[ C^τ ] where τ is the FIRST MEETING TIME of two
independent uniform reverse walks started at a and b (∞ ⇒ 0).  Walks
truncate at ``walk_length`` (meetings beyond it contribute 0 — a
documented downward bias of at most C^(L+1)/(1−C)).

Determinism (the engine-wide contract): walks are the house
``random_walks`` with ``portable=True`` — the step-k draw is a pure
md5-derived function of (walk_id, k, seed) — so any engine replays the
identical walk corpus and the score is REPRODUCIBLE, not just
statistically equivalent.  With the default ``c=0.5`` and
``walks_per_vertex`` a power of two, every per-pair score is an exact
dyadic rational: C^τ, their sum, and the division are all exact in
float64, so scores are bit-identical across engines and partitionings.

Scale shape at 100 TB: walks run ONLY from the pair vertices
(``starts`` — never the whole graph), cost |pairs|·W·L superstep join
rows against the bucketed neighbor index; the pairing join is
walk_id-keyed (equi); the meeting scan is a per-row array expression.
Nothing touches all vertex pairs — SimRank's O(V²) state is exactly
what the MC form avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.operators.walks import random_walks


def simrank_scores(
    edges: DataFrame,
    pairs: DataFrame,
    c: float = 0.5,
    walk_length: int = 4,
    walks_per_vertex: int = 8,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """MC SimRank for the given ``pairs`` (columns id_a, id_b) over the
    directed graph ``edges`` (src, dst).  Output:
    ``(id_a, id_b, n_meet, simrank)`` — ``n_meet`` = walks (of
    ``walks_per_vertex``) whose coupled pair met within the horizon.
    """
    if not (0.0 < c < 1.0):
        raise ValueError(f"decay c must be in (0,1), got {c}")
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    starts = (
        pairs.select(F.col("id_a").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("v")))
        .distinct()
    )
    walks = random_walks(
        rev,
        walk_length=walk_length,
        walks_per_vertex=walks_per_vertex,
        seed=seed,
        portable=True,
        num_partitions=num_partitions,
        starts=starts,
    ).select("walk_id", "path")

    spine = pairs.select(
        "id_a",
        "id_b",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
        ).alias("w"),
    )
    wa = walks.select(
        F.col("walk_id").alias("wid_a"), F.col("path").alias("path_a")
    )
    wb = walks.select(
        F.col("walk_id").alias("wid_b"), F.col("path").alias("path_b")
    )
    joined = (
        spine.withColumn(
            "wid_a", F.concat("id_a", F.lit("#"), F.col("w").cast("string"))
        )
        .withColumn(
            "wid_b", F.concat("id_b", F.lit("#"), F.col("w").cast("string"))
        )
        .join(wa, "wid_a")
        .join(wb, "wid_b")
    )
    # steps 1..L of each path; zip_with null-pads the shorter side and
    # null == x is null (not true), so a stopped walk can never "meet"
    ta = F.slice("path_a", 2, walk_length)
    tb = F.slice("path_b", 2, walk_length)
    tau = F.array_position(F.zip_with(ta, tb, lambda x, y: x == y), True)
    contrib = F.when(
        tau > 0, F.pow(F.lit(float(c)), tau.cast("double"))
    ).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", contrib.alias("s"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum((F.col("s") > 0).cast("long")).alias("n_meet"),
            (F.sum("s") / F.lit(float(walks_per_vertex))).alias("simrank"),
        )
    )
