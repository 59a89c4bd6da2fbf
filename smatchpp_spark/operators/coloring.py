"""Distributed greedy graph coloring — Jones–Plassmann.

The scheduling/symmetry-breaking companion of mis.py (Jones & Plassmann
1993, public): every vertex draws one fixed hash priority; in each
round the vertices that hold the highest priority among their still
uncolored neighbors color themselves with the smallest color unused by
their already-colored neighbors (the greedy "mex").  Rounds are bounded
by the longest priority-decreasing path — O(log n / log log n) w.h.p.
on bounded-degree graphs.  Colors are ≤ max-degree + 1 (greedy bound).

Determinism: priority = ``portable_hash64(vertex:color:seed)`` with
ties broken on the vertex id, so runs replay across engines; the mex is
an ordered left fold over the SORTED distinct neighbor-color list —
bit-identical in Spark (``aggregate ∘ array_sort ∘ collect_set``) and
DuckDB (``list_reduce ∘ list_sort ∘ list(DISTINCT)``).

Round invariant (oracle-replay contract): after k rounds both engines
hold the identical (vertex, color) table — the sssp/mis 1:1 unrolling
argument.

Scale shape at 100 TB: per round one uncolored⋈edges⋈uncolored join to
find blocked vertices (anti-join gives the ready set), one
ready-neighbors⋈colored join + per-vertex fold for the mex, and one
status merge keyed by vertex.  The uncolored set shrinks every round;
the edge table is scanned only against still-uncolored endpoints.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import portable_hash64
from smatchpp_spark.operators.supersteps import SuperstepRunner


@dataclass
class ColoringResult:
    colors: DataFrame  # (vertex, color int) — color NULL iff truncated
    rounds: int
    converged: bool  # every vertex colored
    n_colors: int


def greedy_coloring(
    edges: DataFrame,
    max_supersteps: int = 40,
    seed: int = 7,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> ColoringResult:
    """Jones–Plassmann coloring of the undirected simple graph spanned
    by ``edges`` (direction/multiplicity ignored, self-loops dropped —
    a self-looped vertex admits no proper color)."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    ue = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    vertices = ue.select(F.col("src").alias("vertex")).distinct()
    init = vertices.select(
        "vertex",
        portable_hash64(
            F.concat(F.col("vertex").cast("string"), F.lit(f":color:{seed}"))
        ).alias("prio"),
        F.lit(None).cast("int").alias("color"),
    )

    def step(state: DataFrame, r: int) -> DataFrame:
        unc = state.filter(F.col("color").isNull()).select("vertex", "prio")
        # blocked: an uncolored neighbor with higher (prio, vertex) wins
        u_src = unc.select(
            F.col("vertex").alias("src"), F.col("prio").alias("p_src")
        )
        u_dst = unc.select(
            F.col("vertex").alias("dst"), F.col("prio").alias("p_dst")
        )
        blocked = (
            ue.join(u_src, "src")
            .join(u_dst, "dst")
            .where(
                (F.col("p_src") > F.col("p_dst"))
                | (
                    (F.col("p_src") == F.col("p_dst"))
                    & (F.col("src") > F.col("dst"))
                )
            )
            .select(F.col("dst").alias("vertex"))
            .distinct()
        )
        ready = unc.join(blocked, "vertex", "left_anti").select("vertex")
        # mex over already-colored neighbor colors (ordered fold)
        nb_colors = (
            ue.join(ready.withColumnRenamed("vertex", "dst"), "dst")
            .join(
                state.filter(F.col("color").isNotNull()).select(
                    F.col("vertex").alias("src"), F.col("color")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.array_sort(F.collect_set("color")).alias("cs"))
        )
        mex = F.aggregate(
            F.coalesce(F.col("cs"), F.array().cast("array<int>")),
            F.lit(0),
            lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
        )
        newly = ready.join(nb_colors, "vertex", "left").select(
            "vertex", mex.cast("int").alias("new_color")
        )
        return (
            state.join(newly, "vertex", "left")
            .select(
                "vertex",
                "prio",
                F.coalesce("color", "new_color").cast("int").alias("color"),
            )
        )

    runner = SuperstepRunner(
        spark,
        op="coloring",
        checkpoint_dir=checkpoint_dir,
        max_supersteps=max_supersteps,
        tol=0.0,
    )
    res = runner.run(
        init,
        step,
        lambda old, new: float(new.filter(F.col("color").isNull()).count()),
        resume=resume,
    )
    ue.unpersist()
    colors = res.state.select("vertex", "color")
    row = colors.agg(
        F.count_distinct(F.col("color")).alias("n")
    ).collect()[0]
    return ColoringResult(
        colors=colors,
        rounds=res.supersteps,
        converged=res.converged,
        n_colors=int(row["n"] or 0),
    )
