"""Deterministic random-walk corpus generation over the edge table.

DeepWalk-style walk sampling (Perozzi et al. 2014, public algorithm) —
the training-data primitive for graph embeddings: ``walks_per_vertex``
walks of ``walk_length`` steps from every vertex, each step moving to a
uniformly "random" out-neighbor.  At 10^12 edges the walk corpus IS the
dataset a downstream skip-gram trainer consumes, so generation must be
a bounded number of bulk joins, not a per-walk loop.

Spark-first shape:

* **Neighbor index** — one pass builds ``(src, idx, dst, deg)`` with a
  per-source dense position (``row_number`` over dst inside src — the
  window partitions by src, so no global sort), persisted and reused by
  every step.
* **Step = one equi-join.** Walk state is ``(walk_id, vertex, path)``;
  step k joins state to the index on
  ``vertex = src AND idx = hash(walk_id, k) % deg`` — picking the
  hash-chosen neighbor INSIDE the join condition, so each state row
  matches exactly one index row and the join output is |walks| rows,
  never |walks|·deg.  Dead ends (out-degree 0) keep their row and stop
  extending (standard truncated-walk semantics).
* **Determinism.** The "randomness" is ``xxhash64(walk_id, step)``
  (``portable=True`` → the md5 cross-engine hash): reruns, resumes and
  SQL oracles reproduce every walk exactly.

Skew: a hub's index rows are spread across its partition like any edge
rows; the per-step join is on the walk side's current vertex, so hub
load equals the number of walks currently AT the hub — bounded by
|walks|, not by degree².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64
from smatchpp_spark.operators.supersteps import SuperstepRunner


def neighbor_index(edges: DataFrame) -> DataFrame:
    """(src, idx, dst, deg): distinct out-neighbors with a dense
    per-source position ordered by dst (deterministic under any physical
    partitioning) and the out-degree."""
    from pyspark.sql import Window

    e = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    wc = Window.partitionBy("src")
    return e.select(
        "src",
        (F.row_number().over(w) - 1).alias("idx"),
        "dst",
        F.count(F.lit(1)).over(wc).alias("deg"),
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 5,
    walks_per_vertex: int = 1,
    seed: int = 42,
    portable: bool = False,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """One row per walk: ``(walk_id string, start vertex, path
    array<string>)`` — ``path[0]`` is the start vertex and the walk
    truncates early only at a dead end (|path| ≤ walk_length + 1).

    ``walk_id`` = ``"<start>#<w>"`` for w in [0, walks_per_vertex) —
    stable across runs; the step-k neighbor choice is
    ``hash(walk_id, 'step', k, seed) % deg``.

    Runs through SuperstepRunner: the walk table is the superstep state,
    so a crashed generation run resumes at the committed step and (the
    draws being pure functions of walk_id and k) produces the identical
    corpus; metrics/lineage follow the engine-wide contract.  Early-
    stops only when every walk is at a dead end."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nbr = neighbor_index(edges).repartition(num_partitions, "src").persist()
    nbr.count()  # materialize once; every step reuses this exchange

    vertices = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    init = vertices.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1)),
                lambda w: F.concat(F.col("v"), F.lit("#"), w.cast("string")),
            )
        ).alias("walk_id"),
        F.col("v").alias("vertex"),
        F.array(F.col("v")).alias("path"),
        F.lit(False).alias("stopped"),
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        draw = F.pmod(
            hash64(
                F.concat_ws(
                    "#", F.col("walk_id"), F.lit("step"),
                    F.lit(k).cast("string"), F.lit(str(seed)),
                ),
                portable=True,
            )
            if portable
            else F.xxhash64(F.col("walk_id"), F.lit(k), F.lit(seed)),
            F.col("deg"),
        )
        alive = state.filter(~F.col("stopped"))
        stepped = (
            alive.join(
                nbr,
                (alive["vertex"] == nbr["src"]) & (nbr["idx"] == draw),
                "left",
            )
            .select(
                "walk_id",
                F.coalesce(F.col("dst"), F.col("vertex")).alias("vertex"),
                F.when(
                    F.col("dst").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("dst"))),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.col("dst").isNull().alias("stopped"),
            )
        )
        return stepped.unionByName(state.filter(F.col("stopped")))

    def delta(old: DataFrame, new: DataFrame) -> float:
        # 0 only when every walk is stopped — the single early-exit
        return float(new.filter(~F.col("stopped")).count())

    runner = SuperstepRunner(
        spark,
        op="random_walks",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=walk_length,
        tol=0.0,
    )
    res = runner.run(init, step, delta, resume=resume)
    nbr.unpersist()
    return res.state.select(
        "walk_id",
        F.col("path")[0].alias("start"),
        "path",
    )
